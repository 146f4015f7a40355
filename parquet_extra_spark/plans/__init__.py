from .explain import explain_summary, pushed_filters, read_schema

__all__ = ["explain_summary", "pushed_filters", "read_schema"]
