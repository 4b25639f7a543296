from .flagship import build_shard_partials, run_suite

__all__ = ["build_shard_partials", "run_suite"]
