from .tracer import DerivedGroup, trace_dim_groups  # noqa: F401
