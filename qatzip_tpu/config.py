"""Runtime configuration loader — the driver `.conf` analog.

The reference configures instances per device/process through QAT driver
config files (config_file/{c6xx,c3xxx,dh895xcc}/.../*.conf setting
NumberDcInstances / NumProcesses / LimitDevAccess, SURVEY.md §1) plus the
QAT_SECTION_NAME env override (src/qatzip.c:530-558).

TPU-native equivalent: an INI file selecting device/engine/session
defaults per *section* (the section-name override is kept:
``QZTPU_SECTION_NAME`` plays QAT_SECTION_NAME's role). Search order:

  1. $QZTPU_CONF (explicit path)
  2. ./qztpu.conf
  3. ~/.config/qztpu.conf

Example::

    [SHIM]                    ; default section, like the reference's
    tile_chunks = 128         ; device dispatch depth (buffer-ring analog)
    hw_buff_sz = 65536
    comp_lvl = 1
    polling_mode = periodical
    sw_backup = 1

    [LOWLAT]
    tile_chunks = 16
    hw_buff_sz = 16384
"""

from __future__ import annotations

import configparser
import os
from typing import Dict, Optional

_DEFAULT_SECTION = "SHIM"  # the reference's default section name


def _conf_path() -> Optional[str]:
    explicit = os.environ.get("QZTPU_CONF")
    if explicit and os.path.exists(explicit):
        return explicit
    for cand in ("./qztpu.conf",
                 os.path.expanduser("~/.config/qztpu.conf")):
        if os.path.exists(cand):
            return cand
    return None


def section_name() -> str:
    """QAT_SECTION_NAME analog (src/qatzip.c:536-538)."""
    return os.environ.get("QZTPU_SECTION_NAME", _DEFAULT_SECTION)


_INT_KEYS = {"tile_chunks", "hw_buff_sz", "strm_buff_sz", "comp_lvl",
             "input_sz_thrshold", "req_cnt_thrshold", "wait_cnt_thrshold",
             "sw_backup", "max_forks", "lz4s_mini_match"}


def load(section: Optional[str] = None) -> Dict[str, object]:
    """Load the active section's settings (empty dict when no file)."""
    path = _conf_path()
    if path is None:
        return {}
    cp = configparser.ConfigParser()
    try:
        cp.read(path)
    except configparser.Error:
        return {}
    sec = section or section_name()
    if sec not in cp:
        return {}
    out: Dict[str, object] = {}
    for key, raw in cp[sec].items():
        if key in _INT_KEYS:
            try:
                out[key] = int(raw, 0)
            except ValueError:
                continue
        else:
            out[key] = raw
    return out


def apply_to_params(params, settings: Optional[Dict[str, object]] = None):
    """Overlay config-file settings onto a SessionParams* object."""
    settings = settings if settings is not None else load()
    common = getattr(params, "common", params)
    for key in ("comp_lvl", "hw_buff_sz", "strm_buff_sz",
                "input_sz_thrshold", "req_cnt_thrshold",
                "wait_cnt_thrshold", "sw_backup", "max_forks"):
        if key in settings and hasattr(common, key):
            setattr(common, key, settings[key])
    if "lz4s_mini_match" in settings and hasattr(params, "lz4s_mini_match"):
        params.lz4s_mini_match = settings["lz4s_mini_match"]
    return params
