from .sharding import (
    make_mesh,
    encode_sharded,
    decode_sharded,
    sharded_roundtrip_step,
    split_payload_host,
    assemble_payload_host,
    read_video_sharded,
    write_video_sharded,
)
