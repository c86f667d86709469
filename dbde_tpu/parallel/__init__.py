from .sharding import (
    make_mesh,
    encode_sharded,
    decode_sharded,
    decode_sharded_dispatch,
    decode_sharded_materialize,
    sharded_roundtrip_step,
    split_payload_host,
    assemble_payload_host,
    assemble_payload_padded,
    iter_video_sharded,
    read_video_sharded,
    write_video_sharded,
)
