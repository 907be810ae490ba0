from rsgnet_tpu.ops.pallas.dark_decode import (dark_decode_pallas,
                                               dark_decode_pallas_spmd)

__all__ = ["dark_decode_pallas", "dark_decode_pallas_spmd"]
