from .sharding import (
    make_mesh,
    encode_sharded,
    decode_sharded,
    sharded_roundtrip_step,
)
