"""Pure numpy/pyarrow codec kernels (no Spark dependency).

Importing this package registers all codecs in the registry (base.py).
"""

from . import base, bytescodecs, fsst, intcodecs, primitives  # noqa: F401
from .base import all_codecs, by_id, by_name  # noqa: F401
