from .keys import hash_keys32, hash_keys64

__all__ = ["hash_keys32", "hash_keys64"]
