"""Residual-magnitude → guidance-exponent curves.

The reference fits two piecewise polynomials per domain at import time with
np.polyfit on hard-coded knots and evaluates them through np.vectorize on the
host (Utils/train_test_utils.py:831-865). Here the fits run once in numpy and
evaluation is branch-free jnp.polyval + jnp.where, so the curve application
stays on device inside the adaptive-guidance path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# knot tables (train_test_utils.py:842-865)
_IMG_X1 = [1, 1.1, 1.2, 1.3, 1.4, 1.5, 1.6, 1.7]
_IMG_Y1 = [20, 17.5, 15, 12, 8.5, 5, 2, 1]
_IMG_X2 = [1.7, 1.8, 2.0, 2.2, 2.35, 2.5, 3]
_IMG_Y2 = [1, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05]

_PROJ_X1 = [1, 1.1, 1.2, 1.3, 1.4, 1.5, 1.6, 1.7]
_PROJ_Y1 = [20, 17.5, 15, 12, 8.5, 7.5, 5, 4]
_PROJ_X2 = [1.7, 1.8, 2.0, 2.2, 2.35, 2.5, 3, 3.5]
_PROJ_Y2 = [4, 3, 2, 1, 0.5, 0.3, 0.1, 0.01]


class LambdaCurve:
    """Piecewise curve: f1 (deg-4) on [1, 1.7], f2 (deg-2) on (1.7, 2.75],
    clamped to f1(1) below 1 and f2(2.75) above 2.75
    (reference weight_lambda, train_test_utils.py:831-839)."""

    def __init__(self, x1, y1, x2, y2):
        self.p1 = np.polyfit(x1, y1, 4)
        self.p2 = np.polyfit(x2, y2, 2)
        self._p1 = jnp.asarray(self.p1, dtype=jnp.float32)
        self._p2 = jnp.asarray(self.p2, dtype=jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=jnp.float32)
        xc = jnp.clip(x, 1.0, 2.75)
        f1 = jnp.polyval(self._p1, xc)
        f2 = jnp.polyval(self._p2, xc)
        return jnp.where(xc <= 1.7, f1, f2).astype(jnp.float32)


def curve_init() -> LambdaCurve:
    """Image-domain curve (train_test_utils.py:842-852)."""
    return LambdaCurve(_IMG_X1, _IMG_Y1, _IMG_X2, _IMG_Y2)


def proj_curve_init() -> LambdaCurve:
    """Projection-domain curve (train_test_utils.py:855-865)."""
    return LambdaCurve(_PROJ_X1, _PROJ_Y1, _PROJ_X2, _PROJ_Y2)
