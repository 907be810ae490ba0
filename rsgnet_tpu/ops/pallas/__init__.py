from rsgnet_tpu.ops.pallas.dark_decode import dark_decode_pallas

__all__ = ["dark_decode_pallas"]
