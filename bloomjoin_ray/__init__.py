"""bloomjoin_ray — a Ray-Data-native distributed sketch / approximate-
aggregation engine built from scratch around the ideas of gojiplus/bloomjoin
(Bloom-filter pre-filtered joins), generalized to a mergeable-UDAF family
(Bloom, HyperLogLog, count-min, t-digest, KLL) plus the operators a
large-scale training-data pipeline needs (dedup, similarity search, text
analysis) over Parquet tables streamed through ``ray.data.Dataset``.

Nothing in this package calls ``ray.init`` — sessions are owned by the
caller (tests' conftest fixture, ``bench.py``, or the driver).
"""

from .params import BloomParams, bloom_params, bloom_sizing, bloom_achieved_fpr
from .functions.keys import hash_keys32, hash_keys64
from .state.bloom import BloomSketch

__all__ = [
    "BloomParams",
    "bloom_params",
    "bloom_sizing",
    "bloom_achieved_fpr",
    "hash_keys32",
    "hash_keys64",
    "BloomSketch",
]
