"""Python face of the native IO runtime (native/fastio.c).

Importing this module raises ImportError when the C extension has not been
built (`python native/setup.py` from the repo root); call sites fall back to
pure-Python paths.
"""

import numpy as np

from . import _fastio  # noqa: F401  (built C extension)


def parse_float_pairs(path: str, n: int) -> np.ndarray:
    buf = _fastio.parse_float_pairs(path, n)
    return np.frombuffer(buf, dtype=np.float64).reshape(n, 2)


def write_png(path: str, rgb: np.ndarray) -> None:
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    _fastio.write_png(path, np.ascontiguousarray(rgb).tobytes(), w, h)


def append_lines(path: str, lines) -> None:
    _fastio.append_lines(path, list(lines))
