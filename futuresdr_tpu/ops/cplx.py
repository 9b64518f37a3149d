"""Complex arithmetic as (re, im) float32 pairs.

The TPU backend exposes **no complex dtypes** (XLA:TPU lowers complex
poorly or not at all — probed empirically on this chip: even complex add is
UNIMPLEMENTED). The TPU-native answer is structural: every complex stream is
a :class:`CArray` pytree of two real arrays, all arithmetic is spelled out
in real ops (VPU elementwise, MXU matmuls), and FFTs become real matmuls
(:mod:`futuresdr_tpu.ops.fft`).

``CArray`` overloads the usual operators so block code reads like normal
complex math::

    y = x * x.conj()           # |x|²  as a CArray
    z = cplx.exp_j(phase) * x  # frequency shift

Host boundary: :func:`from_numpy` / :func:`to_numpy` convert numpy
``complex64`` chunks to/from the pair representation.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class CArray:
    """A complex array as two real arrays (same shape/dtype)."""

    __slots__ = ("re", "im")

    def __init__(self, re, im):
        self.re = re
        self.im = im

    # ---- pytree -----------------------------------------------------------
    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # ---- array-ish properties ---------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return jnp.shape(self.re)

    @property
    def ndim(self) -> int:
        return jnp.ndim(self.re)

    @property
    def real_dtype(self):
        return jnp.asarray(self.re).dtype

    def __len__(self) -> int:
        return self.shape[0]

    # ---- arithmetic --------------------------------------------------------
    def _coerce(self, other) -> "CArray":
        if isinstance(other, CArray):
            return other
        if isinstance(other, (complex, np.complexfloating)):
            other = complex(other)
        if isinstance(other, complex):
            return CArray(
                jnp.asarray(other.real, dtype=self.real_dtype),
                jnp.asarray(other.imag, dtype=self.real_dtype),
            )
        # real scalar / array
        arr = jnp.asarray(other)
        return CArray(arr, jnp.zeros_like(arr))

    def __add__(self, other):
        if isinstance(other, CArray):
            return CArray(self.re + other.re, self.im + other.im)
        if isinstance(other, np.complexfloating):
            other = complex(other)
        if isinstance(other, complex):
            return CArray(self.re + other.real, self.im + other.imag)
        return CArray(self.re + other, self.im)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, CArray):
            return CArray(self.re - other.re, self.im - other.im)
        if isinstance(other, np.complexfloating):
            other = complex(other)
        if isinstance(other, complex):
            return CArray(self.re - other.real, self.im - other.imag)
        return CArray(self.re - other, self.im)

    def __rsub__(self, other):
        return (-self).__add__(other)

    def __neg__(self):
        return CArray(-self.re, -self.im)

    def __mul__(self, other):
        if isinstance(other, CArray):
            return CArray(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        if isinstance(other, np.complexfloating):
            other = complex(other)
        if isinstance(other, complex):
            return CArray(
                self.re * other.real - self.im * other.imag,
                self.re * other.imag + self.im * other.real,
            )
        return CArray(self.re * other, self.im * other)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, (CArray, complex, np.complexfloating)):
            o = self._coerce(other)
            denom = o.re * o.re + o.im * o.im
            return CArray(
                (self.re * o.re + self.im * o.im) / denom,
                (self.im * o.re - self.re * o.im) / denom,
            )
        return CArray(self.re / other, self.im / other)

    def __rtruediv__(self, other):
        # real-or-complex / CArray: numerator coerced, standard formula
        num = self._coerce(other)
        denom = self.re * self.re + self.im * self.im
        return CArray(
            (num.re * self.re + num.im * self.im) / denom,
            (num.im * self.re - num.re * self.im) / denom,
        )

    # ---- complex ops --------------------------------------------------------
    def conj(self) -> "CArray":
        return CArray(self.re, -self.im)

    def abs2(self):
        """|z|² as a real array."""
        return self.re * self.re + self.im * self.im

    def abs(self):
        return jnp.sqrt(self.abs2())

    def angle(self):
        return jnp.arctan2(self.im, self.re)

    # ---- structural ----------------------------------------------------------
    def __getitem__(self, idx) -> "CArray":
        return CArray(self.re[idx], self.im[idx])

    def reshape(self, *shape) -> "CArray":
        return CArray(self.re.reshape(*shape), self.im.reshape(*shape))

    def transpose(self, *axes) -> "CArray":
        return CArray(self.re.transpose(*axes), self.im.transpose(*axes))

    @property
    def T(self) -> "CArray":
        return CArray(self.re.T, self.im.T)

    def astype(self, real_dtype) -> "CArray":
        return CArray(self.re.astype(real_dtype), self.im.astype(real_dtype))

    def sum(self, axis=None, keepdims=False) -> "CArray":
        return CArray(
            jnp.sum(self.re, axis=axis, keepdims=keepdims),
            jnp.sum(self.im, axis=axis, keepdims=keepdims),
        )

    def __repr__(self):
        return f"CArray(re={self.re!r}, im={self.im!r})"


ArrayLike = Union[jax.Array, CArray]


def is_complex(x: Any) -> bool:
    return isinstance(x, CArray)


# ---- constructors -----------------------------------------------------------


def czeros(shape, dtype=jnp.float32) -> CArray:
    # re and im must be distinct buffers: donated jit args may not alias
    return CArray(jnp.zeros(shape, dtype=dtype), jnp.zeros(shape, dtype=dtype))


def cones(shape, dtype=jnp.float32) -> CArray:
    return CArray(jnp.ones(shape, dtype=dtype), jnp.zeros(shape, dtype=dtype))

def full_like(x: ArrayLike, value) -> ArrayLike:
    if isinstance(x, CArray):
        value = complex(value)
        return CArray(
            jnp.full_like(x.re, value.real), jnp.full_like(x.im, value.imag)
        )
    return jnp.full_like(x, value)


def exp_j(theta) -> CArray:
    """e^{jθ} for a real θ array."""
    return CArray(jnp.cos(theta), jnp.sin(theta))


def from_numpy(x: np.ndarray, dtype=jnp.float32) -> ArrayLike:
    """numpy → device representation (complex becomes a CArray)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return CArray(
            jnp.asarray(np.ascontiguousarray(x.real), dtype=dtype),
            jnp.asarray(np.ascontiguousarray(x.imag), dtype=dtype),
        )
    return jnp.asarray(x)


def to_numpy(x: ArrayLike) -> np.ndarray:
    if isinstance(x, CArray):
        return np.asarray(x.re) + 1j * np.asarray(x.im)
    return np.asarray(x)


def asarray(x) -> ArrayLike:
    """Coerce python/numpy/jax values, preserving complexity."""
    if isinstance(x, CArray):
        return x
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        return from_numpy(x)
    if isinstance(x, (complex, np.complexfloating)):
        return from_numpy(np.asarray(x))
    if hasattr(x, "dtype"):  # jax array or tracer: never pull to host
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            return from_numpy(np.asarray(x))  # concrete-only path
        return jnp.asarray(x)
    arr = np.asarray(x)
    if np.iscomplexobj(arr):  # lists/tuples of complex included
        return from_numpy(arr)
    return jnp.asarray(arr)


# ---- generic helpers that work on real arrays AND CArrays -------------------


def _map_structural(fn, xs: Sequence[ArrayLike]):
    if any(isinstance(x, CArray) for x in xs):
        xs = [x if isinstance(x, CArray) else CArray(x, jnp.zeros_like(x)) for x in xs]
        return CArray(fn([x.re for x in xs]), fn([x.im for x in xs]))
    return fn(list(xs))


def concat(xs: Sequence[ArrayLike], axis: int = -1) -> ArrayLike:
    return _map_structural(lambda ys: jnp.concatenate(ys, axis=axis), xs)


def stack(xs: Sequence[ArrayLike], axis: int = 0) -> ArrayLike:
    return _map_structural(lambda ys: jnp.stack(ys, axis=axis), xs)


def apply1(fn, x: ArrayLike) -> ArrayLike:
    """Apply a structural (shape-only) op to re & im."""
    if isinstance(x, CArray):
        return CArray(fn(x.re), fn(x.im))
    return fn(x)


def zeros_like_shape(x: ArrayLike, shape) -> ArrayLike:
    if isinstance(x, CArray):
        return czeros(shape, dtype=x.real_dtype)
    return jnp.zeros(shape, dtype=x.dtype)


def mul(a: ArrayLike, b: ArrayLike) -> ArrayLike:
    if isinstance(a, CArray) or isinstance(b, CArray):
        a = a if isinstance(a, CArray) else CArray(jnp.asarray(a), jnp.zeros_like(jnp.asarray(a)))
        return a * b
    return a * b


def einsum(subs: str, a: ArrayLike, b: ArrayLike, precision=None) -> ArrayLike:
    """(Complex) two-operand einsum via real einsums where needed."""

    def f(x, y):
        return jnp.einsum(subs, x, y, precision=precision)

    ca, cb = isinstance(a, CArray), isinstance(b, CArray)
    if not ca and not cb:
        return f(a, b)
    if ca and not cb:
        return CArray(f(a.re, b), f(a.im, b))
    if not ca and cb:
        return CArray(f(a, b.re), f(a, b.im))
    return CArray(
        f(a.re, b.re) - f(a.im, b.im), f(a.re, b.im) + f(a.im, b.re)
    )


def matmul(a: ArrayLike, b: ArrayLike, precision=None) -> ArrayLike:
    """(Complex) matmul via 4 real MXU matmuls where needed."""
    if not isinstance(a, CArray) and not isinstance(b, CArray):
        return jnp.matmul(a, b, precision=precision)
    if not isinstance(a, CArray):
        return CArray(
            jnp.matmul(a, b.re, precision=precision),
            jnp.matmul(a, b.im, precision=precision),
        )
    if not isinstance(b, CArray):
        return CArray(
            jnp.matmul(a.re, b, precision=precision),
            jnp.matmul(a.im, b, precision=precision),
        )
    return CArray(
        jnp.matmul(a.re, b.re, precision=precision)
        - jnp.matmul(a.im, b.im, precision=precision),
        jnp.matmul(a.re, b.im, precision=precision)
        + jnp.matmul(a.im, b.re, precision=precision),
    )
