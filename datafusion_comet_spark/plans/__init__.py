from .introspect import (  # noqa: F401
    assert_operators,
    broadcast_join_count,
    operators_in_plan,
    plan_string,
    pushed_filters,
    shuffle_count,
)
