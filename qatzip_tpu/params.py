"""Session parameter structs, defaults and validation.

Parity reference: ``QzSessionParams*_T`` (include/qatzip.h:460-561), internal
union ``QzSessionParamsInternal_T`` (src/qatzip_internal.h:255-300), validation
``qzCheckParams*`` (src/qatzip_utils.c:385-520), defaults table
``g_sess_params_internal_default`` (src/qatzip.c:135-152).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Callable

from . import constants as C
from .constants import (
    DataFormat, Direction, HuffmanHdr, PollingMode,
    QZ_OK, QZ_PARAMS,
)


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@dataclasses.dataclass
class SessionParamsCommon:
    """Fields shared by every algorithm (qatzip.h ``QzSessionParamsCommon_T``)."""

    direction: Direction = C.QZ_DIRECTION_DEFAULT
    comp_lvl: int = C.QZ_COMP_LEVEL_DEFAULT
    comp_algorithm: str = "deflate"
    max_forks: int = C.QZ_MAX_FORKS_DEFAULT
    sw_backup: int = C.QZ_SW_BACKUP_DEFAULT
    hw_buff_sz: int = C.QZ_HW_BUFF_SZ
    strm_buff_sz: int = C.QZ_STRM_BUFF_SZ_DEFAULT
    input_sz_thrshold: int = C.QZ_COMP_THRESHOLD_DEFAULT
    req_cnt_thrshold: int = C.QZ_REQ_THRESHOLD_DEFAULT
    wait_cnt_thrshold: int = C.QZ_WAIT_CNT_THRESHOLD_DEFAULT
    polling_mode: PollingMode = PollingMode.PERIODICAL_POLLING
    is_sensitive_mode: bool = False

    def check(self, *, max_level: int = C.QZ_DEFLATE_COMP_LVL_MAXIMUM) -> int:
        """Validate; returns QZ_OK or QZ_PARAMS (qatzip_utils.c:385-520)."""
        if self.direction not in (Direction.DIR_COMPRESS,
                                  Direction.DIR_DECOMPRESS,
                                  Direction.DIR_BOTH):
            return QZ_PARAMS
        if not (1 <= self.comp_lvl <= max_level):
            return QZ_PARAMS
        if self.sw_backup not in (C.QZ_SW_BACKUP_OFF, C.QZ_SW_BACKUP_ON,
                                  C.QZ_AUTO_SELECT_BEST):
            return QZ_PARAMS
        if not (_is_pow2(self.hw_buff_sz)
                and C.QZ_HW_BUFF_MIN_SZ <= self.hw_buff_sz <= C.QZ_HW_BUFF_MAX_SZ):
            return QZ_PARAMS
        if not (C.QZ_STRM_BUFF_MIN_SZ <= self.strm_buff_sz
                <= C.QZ_STRM_BUFF_MAX_SZ):
            return QZ_PARAMS
        if self.input_sz_thrshold < C.QZ_COMP_THRESHOLD_MINIMUM:
            return QZ_PARAMS
        if not (C.QZ_REQ_THRESHOLD_MINIMUM <= self.req_cnt_thrshold
                <= C.QZ_REQ_THRESHOLD_MAXIMUM):
            return QZ_PARAMS
        return QZ_OK


@dataclasses.dataclass
class SessionParamsDeflate:
    """Deflate session params (qatzip.h ``QzSessionParamsDeflate_T``)."""

    common: SessionParamsCommon = dataclasses.field(
        default_factory=SessionParamsCommon)
    huffman_hdr: HuffmanHdr = HuffmanHdr.DYNAMIC_HDR
    data_fmt: DataFormat = C.QZ_DATA_FORMAT_DEFAULT

    algorithm = "deflate"

    def check(self, *, gen4: bool = False) -> int:
        max_lvl = (C.QZ_DEFLATE_COMP_LVL_MAXIMUM_GEN4 if gen4
                   else C.QZ_DEFLATE_COMP_LVL_MAXIMUM)
        rc = self.common.check(max_level=max_lvl)
        if rc != QZ_OK:
            return rc
        if self.huffman_hdr not in (HuffmanHdr.DYNAMIC_HDR, HuffmanHdr.STATIC_HDR):
            return QZ_PARAMS
        if self.data_fmt not in (DataFormat.DEFLATE_4B, DataFormat.DEFLATE_GZIP,
                                 DataFormat.DEFLATE_GZIP_EXT,
                                 DataFormat.DEFLATE_RAW, DataFormat.ZLIB):
            return QZ_PARAMS
        return QZ_OK


@dataclasses.dataclass
class SessionParamsLZ4:
    """LZ4 session params (qatzip.h ``QzSessionParamsLZ4_T``)."""

    common: SessionParamsCommon = dataclasses.field(
        default_factory=SessionParamsCommon)

    algorithm = "lz4"

    def check(self, *, gen4: bool = False) -> int:
        rc = self.common.check(max_level=C.QZ_LZ4_COMP_LVL_MAXIMUM)
        if rc != QZ_OK:
            return rc
        return QZ_OK


@dataclasses.dataclass
class SessionParamsLZ4S:
    """LZ4s session params (qatzip.h ``QzSessionParamsLZ4S_T``).

    ``qzCallback`` is the lz4s→zstd post-process hook
    (reference ``qzLZ4SCallbackFn``, include/qatzip.h:447-449, invoked from
    src/qatzip.c:2217-2249).
    """

    common: SessionParamsCommon = dataclasses.field(
        default_factory=SessionParamsCommon)
    lz4s_mini_match: int = C.LZ4S_MIN_MATCH_DEFAULT
    qzCallback: Optional[Callable] = None
    callback_external: Optional[object] = None

    algorithm = "lz4s"

    def check(self, *, gen4: bool = False) -> int:
        rc = self.common.check(max_level=C.QZ_LZ4_COMP_LVL_MAXIMUM)
        if rc != QZ_OK:
            return rc
        if self.lz4s_mini_match not in (3, 4):
            return QZ_PARAMS
        return QZ_OK


@dataclasses.dataclass
class SessionParams:
    """Legacy combined params (qatzip.h ``QzSessionParams_T``), deflate-only.

    Reference keeps this for API v1 compat (``qzSetupSession``,
    src/qatzip.c:1027-1068).
    """

    huffman_hdr: HuffmanHdr = HuffmanHdr.DYNAMIC_HDR
    direction: Direction = C.QZ_DIRECTION_DEFAULT
    data_fmt: DataFormat = C.QZ_DATA_FORMAT_DEFAULT
    comp_lvl: int = C.QZ_COMP_LEVEL_DEFAULT
    comp_algorithm: str = "deflate"
    max_forks: int = C.QZ_MAX_FORKS_DEFAULT
    sw_backup: int = C.QZ_SW_BACKUP_DEFAULT
    hw_buff_sz: int = C.QZ_HW_BUFF_SZ
    strm_buff_sz: int = C.QZ_STRM_BUFF_SZ_DEFAULT
    input_sz_thrshold: int = C.QZ_COMP_THRESHOLD_DEFAULT
    req_cnt_thrshold: int = C.QZ_REQ_THRESHOLD_DEFAULT
    wait_cnt_thrshold: int = C.QZ_WAIT_CNT_THRESHOLD_DEFAULT

    def to_deflate(self) -> SessionParamsDeflate:
        common = SessionParamsCommon(
            direction=self.direction, comp_lvl=self.comp_lvl,
            comp_algorithm=self.comp_algorithm, max_forks=self.max_forks,
            sw_backup=self.sw_backup, hw_buff_sz=self.hw_buff_sz,
            strm_buff_sz=self.strm_buff_sz,
            input_sz_thrshold=self.input_sz_thrshold,
            req_cnt_thrshold=self.req_cnt_thrshold,
            wait_cnt_thrshold=self.wait_cnt_thrshold)
        return SessionParamsDeflate(common=common, huffman_hdr=self.huffman_hdr,
                                    data_fmt=self.data_fmt)

    def check(self, *, gen4: bool = False) -> int:
        # Legacy API rejects level > 9 even on gen4 and routes 9 to SW
        # (reference src/qatzip.c:2101-2103).
        return self.to_deflate().check(gen4=False)


# Module-level mutable defaults, mirroring qz{Set,Get}Defaults* families
# (src/qatzip.c:3071-3174). Guarded copies to avoid shared mutation.
_defaults = {
    "deflate": SessionParamsDeflate(),
    "lz4": SessionParamsLZ4(),
    "lz4s": SessionParamsLZ4S(),
    "legacy": SessionParams(),
}


def get_defaults(kind: str = "legacy"):
    """qzGetDefaults analog — returns a copy of the current defaults,
    overlaid with the active config-file section (the driver-.conf analog,
    see config.py)."""
    import copy

    p = copy.deepcopy(_defaults[kind])
    from .config import apply_to_params, load
    settings = load()
    if settings:
        apply_to_params(p, settings)
    return p


def set_defaults(params, kind: str = "legacy") -> int:
    """qzSetDefaults analog — validates then installs new defaults."""
    import copy

    rc = params.check()
    if rc != QZ_OK:
        return rc
    _defaults[kind] = copy.deepcopy(params)
    return QZ_OK
