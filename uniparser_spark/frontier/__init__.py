from .politeness import politeness_audit, schedule_batch
from .sharding import rendezvous_shards, shard_loads
from .seen import BloomSeenFilter, add_surt_keys, add_url_keys

__all__ = [
    "BloomSeenFilter",
    "add_surt_keys",
    "add_url_keys",
    "politeness_audit",
    "rendezvous_shards",
    "schedule_batch",
    "shard_loads",
]
