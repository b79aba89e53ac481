"""Reference-faithful ETL pipelines (SURVEY §2.11): products, orders,
order_items, plus the orchestrator that replaces Step Functions."""

from .config import ZoneConfig
from .orders import run_orders
from .order_items import run_order_items
from .products import run_products
from .runner import choose_job, run_all

__all__ = [
    "ZoneConfig",
    "run_products",
    "run_orders",
    "run_order_items",
    "choose_job",
    "run_all",
]
