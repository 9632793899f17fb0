"""Process runtime — device discovery, engine pool, SW-fallback gating.

Parity reference: ``src/qatzip.c`` L2 — ``qzInit`` (:561), the instance pool
with device round-robin shuffle (:716-729), the spin-lock instance grab
(``qzGrabInstance`` :333-366) and the BACKOUT-to-software policy (:510-528).

TPU mapping: the "instance pool" is the set of addressable JAX devices; the
per-instance DMA buffer rings become per-device in-flight dispatch slots
(JAX's async dispatch queue plays the role of the 32-deep CPA ring). Failure
to initialise JAX (or finding zero devices) converts to SW-only mode when
``sw_backup`` is set, or a hard QZ_NOSW_NO_HW otherwise — the exact BACKOUT
semantics.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional

from .constants import (
    QZ_OK, QZ_DUPLICATE, QZ_NO_HW, QZ_NOSW_NO_HW,
)
from .utils.debug import qz_log


class Runtime:
    """Singleton process runtime (analog of ``g_process``)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.initialized = False
        self.hw_available = False
        self.devices: List = []
        self.platform: Optional[str] = None
        self.gen4 = False  # "new generation" flag; TPU v5+ analog
        self._engines = {}
        self._grab_rr = 0

    # -- qzInit ------------------------------------------------------------
    def init(self, sw_backup: int = 1) -> int:
        """Bring up the device runtime (qzInit analog, src/qatzip.c:561).

        Returns QZ_OK, QZ_DUPLICATE (already up), QZ_NO_HW (SW-only), or
        QZ_NOSW_NO_HW when no device and sw_backup==0.
        """
        with self._lock:
            if self.initialized:
                return QZ_DUPLICATE
            if os.environ.get("QZTPU_FORCE_SW") == "1":
                self.initialized = True
                self.hw_available = False
                return QZ_NO_HW if sw_backup else QZ_NOSW_NO_HW
            try:
                import jax
                # addressable devices only: under jax.distributed each
                # process drives its local chips (the per-process instance
                # allocation of the reference driver conf,
                # config_file/.../c6xx_dev0.conf:118-120); global-mesh
                # work goes through parallel/multihost.py explicitly
                self.devices = list(jax.local_devices())
                self.platform = self.devices[0].platform if self.devices else None
                self.hw_available = bool(self.devices)
                # Treat TPU v5+ (and any non-CPU backend) as "gen4"-class:
                # higher levels and bigger rings allowed.
                kinds = " ".join(getattr(d, "device_kind", "") or ""
                                 for d in self.devices)
                self.gen4 = self.platform == "tpu" or "v5" in kinds
            except Exception as e:  # noqa: BLE001 — any backend failure
                qz_log("qzInit: device bring-up failed: %s", e)
                self.hw_available = False
                self.devices = []
            self.initialized = True
            if not self.hw_available:
                return QZ_NO_HW if sw_backup else QZ_NOSW_NO_HW
            qz_log("qzInit: %d %s device(s)", len(self.devices), self.platform)
            return QZ_OK

    # -- engine pool ---------------------------------------------------------
    def get_engine(self, algorithm: str):
        """Build (lazily, once) the accelerated engine for ``algorithm``.

        Analog of qzSetupHW's lazy session/instance setup
        (src/qatzip.c:1203-1269). Returns None when no device is available
        or the engine fails to build — the caller then routes SW, mirroring
        the sw_compression fallback on qzGrabInstance failure (:2124).
        """
        if not self.initialized:
            self.init(1)
        if not self.hw_available:
            return None
        key = algorithm
        eng = self._engines.get(key)
        if eng is not None:
            return eng
        with self._lock:
            eng = self._engines.get(key)
            if eng is not None:
                return eng
            try:
                from .parallel.dispatch import build_engine
                eng = build_engine(algorithm, self.devices)
            except Exception as e:  # noqa: BLE001
                qz_log("engine build failed for %s: %s", algorithm, e)
                eng = None
            if eng is not None:
                self._engines[key] = eng
            return eng

    def grab_device(self):
        """Round-robin device pick (qzGrabInstance analog)."""
        if not self.devices:
            return None
        with self._lock:
            d = self.devices[self._grab_rr % len(self.devices)]
            self._grab_rr += 1
            return d

    def close(self) -> int:
        """qzClose analog — drop engines; keep device handles (cheap)."""
        with self._lock:
            self._engines.clear()
            self.initialized = False
            return QZ_OK


_runtime = Runtime()


def get_runtime() -> Runtime:
    return _runtime


def qz_init(sw_backup: int = 1) -> int:
    return _runtime.init(sw_backup)


def qz_close() -> int:
    return _runtime.close()
