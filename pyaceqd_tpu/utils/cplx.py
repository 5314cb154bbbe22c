"""Complex-safe jit boundary for the axon TPU backend.

Empirically verified on this hardware (TPU v5e via the experimental 'axon'
PJRT plugin): complex64 arithmetic, eigh, expm and scans all work INSIDE a
compiled program, but any program whose *entry signature* contains complex
buffers — including plain device-to-host transfers of complex arrays — fails
with UNIMPLEMENTED.  The fix is structural: complex values never cross the
jit boundary.  :func:`hostsafe` wraps a function so that

- complex array arguments are split host-side into float (2, ...) stacks and
  recombined with ``jax.lax.complex`` inside the traced function;
- complex outputs are split inside the trace and recombined host-side into
  NumPy complex arrays.

On CPU (tests, virtual-mesh dry runs) it reduces to a plain ``jax.jit``.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyaceqd_tpu import config


class CPair(NamedTuple):
    """Pytree node holding the (real, imag) float split of a complex array."""
    re: object
    im: object


def _is_complex_leaf(x):
    try:
        return np.issubdtype(np.asarray(x).dtype if not hasattr(x, "dtype") else x.dtype,
                             np.complexfloating)
    except Exception:
        return False


def _split_host(x):
    if isinstance(x, (np.ndarray, jnp.ndarray)) or hasattr(x, "dtype"):
        if _is_complex_leaf(x):
            xr = np.ascontiguousarray(np.real(x))
            xi = np.ascontiguousarray(np.imag(x))
            return CPair(xr, xi)
    elif isinstance(x, complex):
        return CPair(np.float32(x.real), np.float32(x.imag))
    return x


def _join_traced(x):
    if isinstance(x, CPair):
        return jax.lax.complex(jnp.asarray(x.re), jnp.asarray(x.im))
    return x


def _split_traced(x):
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating):
        return CPair(jnp.real(x), jnp.imag(x))
    return x


def _join_host(x):
    if isinstance(x, CPair):
        return np.asarray(x.re) + 1j * np.asarray(x.im)
    return np.asarray(x) if hasattr(x, "dtype") else x


def _needs_hostsafe():
    return jax.default_backend() not in ("cpu",)


def hostsafe(fn=None, *, static_argnames=()):
    """jit with a complex-free entry/exit signature on accelerator backends.

    Use exactly like ``jax.jit(fn, static_argnames=...)`` for functions whose
    positional args / outputs may be complex arrays.  Keyword args listed in
    static_argnames are passed through statically.
    """
    if fn is None:
        return functools.partial(hostsafe, static_argnames=static_argnames)

    import inspect
    sig = inspect.signature(fn)
    statics = tuple(static_argnames)
    jitted_plain = jax.jit(fn, static_argnames=statics)

    # inner takes everything by keyword so static_argnames bind regardless of
    # whether the caller passed them positionally (jax.jit can resolve
    # positional statics only against the real signature, which a *args
    # trampoline doesn't have)
    @functools.partial(jax.jit, static_argnames=statics)
    def inner(**kw):
        stat = {k: kw[k] for k in kw if k in statics}
        arr = {k: kw[k] for k in kw if k not in statics}
        arr = jax.tree_util.tree_map(_join_traced, arr,
                                     is_leaf=lambda x: isinstance(x, CPair))
        out = fn(**arr, **stat)
        return jax.tree_util.tree_map(_split_traced, out)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        # settle the global precision (jax_enable_x64) BEFORE dispatching:
        # if the lazy init instead fires inside the trace, the entry avals
        # are canonicalized under the old x64 setting while the runtime
        # buffers convert under the new one — "Executable expected parameter
        # of size N but got buffer with incompatible size 2N" on the first
        # hostsafe call of a process that touched no engine path first
        config.precision()
        if not _needs_hostsafe():
            return jitted_plain(*args, **kwargs)
        bound = sig.bind(*args, **kwargs)
        bound.apply_defaults()
        host = {k: (v if k in statics
                    else jax.tree_util.tree_map(_split_host, v))
                for k, v in bound.arguments.items()}
        out = inner(**host)
        return jax.tree_util.tree_map(_join_host, out,
                                      is_leaf=lambda x: isinstance(x, CPair))

    # expose the plain jitted callable for AOT introspection (.lower ->
    # compiled HLO) on CPU/virtual-mesh runs, e.g. the bench's collective
    # audit of sharded sweep programs.  Precision must settle here too: a
    # process whose FIRST jit entry goes through _jitted would otherwise
    # canonicalize entry avals under the pre-init x64 setting (ADVICE r3).
    @functools.wraps(fn)
    def jitted_settled(*args, **kwargs):
        config.precision()
        return jitted_plain(*args, **kwargs)

    jitted_settled.lower = lambda *a, **k: (config.precision(),
                                            jitted_plain.lower(*a, **k))[1]
    wrapper._jitted = jitted_settled
    return wrapper


def device_runner(fn, static_argnames=()):
    """Device-resident-argument runner for steady-state timing.

    ``hostsafe`` re-splits and re-uploads every argument per call and joins
    the full output back to host — correct for library calls, but on a
    tunneled backend the transfers dominate steady-state measurements
    (measured at the bench shapes: 0.2 s compute vs ~2 s readback of the
    40 MB output, scripts/sweep_layout_exp.py H1).  This returns
    ``(upload, run)``: ``upload(args)`` splits complex leaves and
    device_puts once; ``run(handle, **statics)`` executes the jitted program
    on the resident buffers and returns the on-device (split) output — pair
    with ``force``/``readback`` below to time execution and transfer apart."""
    statics = tuple(static_argnames)

    @functools.partial(jax.jit, static_argnames=statics)
    def _run(split_args, **stat):
        args_c = jax.tree_util.tree_map(
            _join_traced, split_args, is_leaf=lambda x: isinstance(x, CPair))
        out = fn(*args_c, **stat)
        return jax.tree_util.tree_map(_split_traced, out)

    def upload(args):
        config.precision()
        split = jax.tree_util.tree_map(_split_host, args)
        dev = jax.device_put(split)
        jax.block_until_ready(dev)
        return dev

    return upload, _run


def force(out):
    """Force completion of a device computation by fetching ONE output
    element (on the tunneled axon backend, block_until_ready can return
    before execution finishes — measured 'compute 0.000 s' on a program
    whose readback then took 5.7 s; a single-element transfer cannot)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def readback(out):
    """Join a device (split) output back to host complex numpy."""
    return jax.tree_util.tree_map(
        _join_host, out, is_leaf=lambda x: isinstance(x, CPair))


def device_get(x):
    """Fetch an array to host NumPy, routing complex through a float split."""
    if x is None:
        return None
    config.precision()   # settle x64 before the inline jit (ADVICE r3)
    if _needs_hostsafe() and _is_complex_leaf(x):
        re, im = jax.jit(lambda a: (jnp.real(a), jnp.imag(a)))(x)
        return np.asarray(re) + 1j * np.asarray(im)
    return np.asarray(x)
