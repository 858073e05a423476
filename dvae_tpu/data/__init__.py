from dvae_tpu.data.io import read_wav, write_wav

__all__ = ["read_wav", "write_wav"]
