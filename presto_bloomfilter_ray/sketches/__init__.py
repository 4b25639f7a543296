from .base import (
    Sketch,
    deserialize,
    from_base64,
    read_hash,
    read_kind,
    read_params,
)
from .ams import AMSSketch
from .apbf import AgePartitionedBloom
from .bloom import DEFAULT_EXPECTED_INSERTIONS, DEFAULT_FPP, BloomFilter
from .cbf import CountingBloomFilter
from .cuckoo import CuckooFilter
from .fd import FrequentDirections
from .priority import PrioritySample
from .countmin import CountMin
from .hll import HyperLogLog
from .iblt import IBLT
from .kll import KLL
from .tdigest import TDigest
from .sample import BottomKSample
from .scalable import ScalableBloomFilter
from .topk import TopK
from .theta import ThetaSketch

__all__ = [
    "Sketch",
    "BloomFilter",
    "CountingBloomFilter",
    "CuckooFilter",
    "ScalableBloomFilter",
    "IBLT",
    "AgePartitionedBloom",
    "AMSSketch",
    "FrequentDirections",
    "PrioritySample",
    "HyperLogLog",
    "CountMin",
    "TDigest",
    "ThetaSketch",
    "BottomKSample",
    "TopK",
    "KLL",
    "deserialize",
    "from_base64",
    "read_hash",
    "read_kind",
    "read_params",
    "DEFAULT_EXPECTED_INSERTIONS",
    "DEFAULT_FPP",
]
