from konohadataplatform_spark.sources.star_schema import (
    TABLES,
    load_star_schema,
    register_views,
)

__all__ = ["TABLES", "load_star_schema", "register_views"]
