from .join import BloomJoinResult, bloom_join, hash_join
from .plan import OnSpec, plan_prefilter, resolve_on

__all__ = ["BloomJoinResult", "bloom_join", "hash_join", "OnSpec",
           "plan_prefilter", "resolve_on"]
