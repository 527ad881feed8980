"""Deterministic synthetic fixtures (seeded; pure functions of the seed)."""

from .persons import Lcg, make_clean, make_dirty  # noqa: F401
from .pages import make_pages, PAGE_TEMPLATE  # noqa: F401
from .households import make_household_scenario  # noqa: F401
