"""presto_bloomfilter_ray — a Ray-Data-native distributed sketch engine.

Brand-new implementation (NOT a port) of the capabilities of
RobinUS2/presto-bloomfilter — mergeable Bloom filters with the
reference's bloom_filter / bloom_filter_contains semantics — extended
per the north rule with HLL, count-min, t-digest and KLL companion
sketches, all expressed as mergeable UDAFs over ``ray.data.Dataset``
pipelines with explicit partitioning, checkpointed partials and
per-partition lineage.
"""

from .sketches import (
    IBLT,
    KLL,
    AgePartitionedBloom,
    BottomKSample,
    TopK,
    BloomFilter,
    CountMin,
    CountingBloomFilter,
    HyperLogLog,
    ScalableBloomFilter,
    Sketch,
    TDigest,
    ThetaSketch,
    deserialize,
    from_base64,
    read_hash,
    read_kind,
    read_params,
)

__version__ = "0.1.0"
