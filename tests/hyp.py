"""Shared hypothesis settings for the property suites — ONE budget
(tests/test_properties.py and tests/test_graph_timeseries.py both run
under it, so a tuning change cannot silently diverge the two)."""
from hypothesis import HealthCheck, settings

SLOW = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
