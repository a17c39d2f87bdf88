"""Write-side connectors beyond the parquet merge layouts.

- ``jdbc_upsert`` — the reference's relational load path (hash-guarded
  ``INSERT ... ON CONFLICT DO UPDATE``) as a distributed executor-side sink.
"""

from . import jdbc_upsert

__all__ = ["jdbc_upsert"]
