from .explain import assert_no_python_udf, explain_str, has_node, pushed_filters

__all__ = ["assert_no_python_udf", "explain_str", "has_node", "pushed_filters"]
