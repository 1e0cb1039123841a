from realtimedatawarehouse_self_spark.functions.exprs import (  # noqa: F401
    dec,
    window_bounds,
)
