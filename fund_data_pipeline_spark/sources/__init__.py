from .csv_landing import (  # noqa: F401
    read_landing_csvs,
    read_per_entity_csvs,
    union_conformed,
)
from .registry import active_entities, resume_anti_join  # noqa: F401
