from .inspect import (assert_no_python_eval, explain_str,  # noqa: F401
                      pushed_filters, read_schema, shuffle_count)
from .skew import key_skew_report, suggest_salt  # noqa: F401
