from .catalog import CATALOG, HIGHWAY_VALID  # noqa: F401
from .engine import gate, problems, stdout_log  # noqa: F401
from .oracle import way_problems  # noqa: F401
