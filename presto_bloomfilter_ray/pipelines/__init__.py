from .flagship import build_shard_partials, run_suite
from .prepare import prepare_corpus
from .probe import probe_and_write
from .streaming import (
    stream_aggregate,
    stream_dedup_window,
    stream_windowed_aggregate,
)

__all__ = ["build_shard_partials", "run_suite", "prepare_corpus",
           "probe_and_write", "stream_aggregate",
           "stream_windowed_aggregate", "stream_dedup_window"]
