from visualrwkv_tpu.ops.wkv7 import (  # noqa: F401
    wkv7,
    wkv7_chunked,
    wkv7_reference,
    wkv7_step,
)
