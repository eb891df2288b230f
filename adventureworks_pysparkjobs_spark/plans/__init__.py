from .inspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "physical_plan",
]
