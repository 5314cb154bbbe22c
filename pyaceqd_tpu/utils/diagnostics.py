"""Process-tensor build diagnostics, surfaced to callers.

The r2 review found that accuracy-relevant build facts (stationary-cycle
residual, chi_max saturation) were emitted only as Python warnings, which
sweeps routinely filter.  This registry records the facts of the most recent
PT build/load so any caller — examples, benches, tests, user sweeps — can
assert on them programmatically:

    from pyaceqd_tpu import last_pt_info
    info = last_pt_info()
    assert not info["saturated"], info

Fields (all present after any phonon run; None where not applicable):
  engine          "finite" | "stationary"
  chi             achieved bond dimension
  chi_max         configured cap
  saturated       True when chi >= chi_max (bond truncation, not the SVD
                  threshold, limits accuracy — docs/accuracy.md)
  period          bulk cycle period (stationary only)
  build_residual  final weighted lag-P emission drift (stationary only);
                  observable error at the cycle junction tracks ~10x this
  n_mem           memory window in steps (stationary: the BUILD window,
                  after the exact-metric automatic reduction)
  n_mem_req       requested window before the automatic reduction
                  (stationary only; == n_mem when no reduction applied)
  cached          True when served from an on-disk artifact
  path            cache artifact path

The registry is process-global and last-write-wins, matching how the
reference exposes its PT artifacts (one shared PT file per sweep,
/root/reference/pyaceqd/general_system/general_system.py:146-157).
"""

import threading

_lock = threading.Lock()
_LAST = {}

_FIELDS = ("engine", "chi", "chi_max", "saturated", "period",
           "build_residual", "n_mem", "n_mem_req", "cached", "path")


def record_pt(**kw):
    """Record the facts of a PT build/load (engine-internal)."""
    info = {k: None for k in _FIELDS}
    info.update(kw)
    with _lock:
        _LAST.clear()
        _LAST.update(info)


def last_pt_info():
    """Diagnostics of the most recent process-tensor build/load (dict copy),
    or None if no phonon simulation has run in this process."""
    with _lock:
        return dict(_LAST) if _LAST else None


def format_pt_info(info=None):
    """One-line human-readable summary for examples/logs."""
    info = info if info is not None else last_pt_info()
    if not info:
        return "PT: none built"
    parts = ["PT[{}] chi={}/{}{}".format(
        info["engine"], info["chi"], info["chi_max"],
        " SATURATED" if info["saturated"] else "")]
    if info.get("period") is not None:
        parts.append("period={}".format(info["period"]))
    if info.get("build_residual") is not None:
        parts.append("residual={:.1e}".format(info["build_residual"]))
    if info.get("n_mem_req") and info["n_mem_req"] != info["n_mem"]:
        parts.append("n_mem={} (req {})".format(info["n_mem"],
                                                info["n_mem_req"]))
    else:
        parts.append("n_mem={}".format(info["n_mem"]))
    parts.append("cached" if info.get("cached") else "built")
    return " ".join(parts)
