from .politeness import politeness_audit, schedule_batch
from .seen import BloomSeenFilter, add_surt_keys, add_url_keys

__all__ = [
    "BloomSeenFilter",
    "add_surt_keys",
    "add_url_keys",
    "politeness_audit",
    "schedule_batch",
]
