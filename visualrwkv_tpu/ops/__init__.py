from visualrwkv_tpu.ops.wkv6 import (  # noqa: F401
    wkv6,
    wkv6_chunked,
    wkv6_reference,
    wkv6_step,
)
from visualrwkv_tpu.ops.wkv7 import (  # noqa: F401
    wkv7,
    wkv7_chunked,
    wkv7_reference,
    wkv7_step,
)
