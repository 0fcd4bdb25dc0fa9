from .planner import CatalogState, plan_updates  # noqa: F401
