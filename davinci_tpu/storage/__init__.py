from davinci_tpu.storage.kv import MemoryKV, SQLiteKV
from davinci_tpu.storage.storage import Storage, VoteIDStatus

__all__ = ["MemoryKV", "SQLiteKV", "Storage", "VoteIDStatus"]
