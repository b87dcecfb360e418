from .logging import RunLogger, read_metrics  # noqa: F401
from .reporting import collect_runs, latex_row, parse_classification_report  # noqa: F401
from . import profiling, viz  # noqa: F401
