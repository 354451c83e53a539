from lakeforge.pipelines.medallion import (
    bronze_to_silver,
    build_gold,
    silver_schemas,
)

__all__ = ["bronze_to_silver", "build_gold", "silver_schemas"]
