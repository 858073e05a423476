from dvae_tpu.data.catalog import demand, ntcd_timit, qut

__all__ = ["ntcd_timit", "qut", "demand"]
