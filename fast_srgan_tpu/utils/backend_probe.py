"""Timeout-bounded JAX backend initialization probe.

``jax.devices()`` *initializes* the backend on first call, and on a
tunneled accelerator platform (this environment's remote TPU) that init
can block indefinitely during an infrastructure outage. Callers that must
not hang — the benchmark CLI, the driver-facing multichip dryrun — probe
through this helper instead: the init runs on a daemon thread with a
deadline, so a stalled handshake is reported rather than inherited. The
thread is a daemon on purpose: if it is stuck inside the backend handshake
there is no way to cancel it, and it must not keep the process alive.

Normal init is sub-second when the backend is already up and a few seconds
cold on a healthy tunnel; compile time is NOT part of this probe. Timeouts
well above that (minutes) therefore separate outages from slow starts.
"""

from __future__ import annotations

import threading
from typing import Optional, Tuple


def probe_device_count(
    timeout_s: float,
) -> Tuple[Optional[int], Optional[str]]:
    """Initialize the backend and count devices, bounded by ``timeout_s``.

    Returns ``(count, None)`` on success, ``(None, None)`` when init did
    not finish within the deadline (outage signature), and ``(None, repr)``
    when init raised.
    """
    done = threading.Event()
    info: dict = {}

    def probe() -> None:
        try:
            import jax

            from fast_srgan_tpu.utils.platforms import honor_env_platforms

            # JAX_PLATFORMS=cpu must probe the CPU backend, not the
            # sitecustomize-forced tunnel platform (utils/platforms.py).
            honor_env_platforms()
            info["n"] = len(jax.devices())
        except Exception as e:  # reported to the caller, not raised here
            info["error"] = repr(e)
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        return None, None
    if "error" in info:
        return None, info["error"]
    return info["n"], None
