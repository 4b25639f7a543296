from .flagship import build_shard_partials, run_suite
from .probe import probe_and_write

__all__ = ["build_shard_partials", "run_suite", "probe_and_write"]
