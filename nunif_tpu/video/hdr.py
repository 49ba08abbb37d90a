"""HDR -> SDR tone mapping, jitted on device.

Numeric parity target: reference ``hdr2sdr`` (nunif/utils/video.py:309-417)
— BT.2020 PQ/HLG input frames are converted to BT.709/BT.601 SDR on device
before the model callback — plus the HDR-metadata reader role of
nunif/utils/pyav_extra.py:6-25 (mastering display max luminance / MaxCLL),
which here comes from the native reader (native/video_io.cpp
``vio_reader_color_info``).

TPU design: one fused XLA program per frame geometry, uint8/uint16 in ->
uint8/uint16 out.  All math in fp32 (color transforms are too precision-
sensitive for bf16 at the black end of the PQ curve).

Two tone-map modes:

- ``mode="hable"`` (default): the reference algorithm exactly — PQ/HLG
  EOTF -> fixed exposure -> Hable filmic curve normalized by a white
  point -> BT.2020->BT.709/601 matrix -> BT.709 piecewise OETF.  Golden
  tested against the actual reference code (tests/test_golden_reference).
- ``mode="bt2390"``: a metadata-driven alternative — absolute nits ->
  BT.2408 203-nit reference white -> knee rolloff bounded by the content
  peak (mastering max luminance / MaxCLL via ``choose_peak_nits``) ->
  gamut matrix with desaturating soft clip -> display gamma 2.2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# AVColorTransferCharacteristic values (FFmpeg pixfmt.h)
TRC_PQ = 16
TRC_HLG = 18

SDR_WHITE_NITS = 203.0   # ITU-R BT.2408 reference white

# BT.2020 -> BT.709 primaries, D65 (derived from the standard RGB<->XYZ
# matrices; rows sum to 1)
_BT2020_TO_BT709 = jnp.array([
    [1.660491, -0.587641, -0.072850],
    [-0.124550, 1.132900, -0.008349],
    [-0.018151, -0.100579, 1.118730],
], jnp.float32)

# BT.2020 luma coefficients
_Y2020 = jnp.array([0.2627, 0.6780, 0.0593], jnp.float32)


def pq_eotf(e):
    """SMPTE ST 2084 EOTF: non-linear [0,1] -> absolute luminance in nits."""
    m1 = 2610.0 / 16384.0
    m2 = 2523.0 / 4096.0 * 128.0
    c1 = 3424.0 / 4096.0
    c2 = 2413.0 / 4096.0 * 32.0
    c3 = 2392.0 / 4096.0 * 32.0
    e = jnp.clip(e, 0.0, 1.0)
    p = jnp.power(e, 1.0 / m2)
    num = jnp.maximum(p - c1, 0.0)
    den = c2 - c3 * p
    return 10000.0 * jnp.power(num / den, 1.0 / m1)


def hlg_eotf(e, peak_nits=1000.0):
    """ARIB STD-B67 inverse OETF + BT.2100 OOTF -> nits (1000-nit display)."""
    a, b, c = 0.17883277, 0.28466892, 0.55991073
    e = jnp.clip(e, 0.0, 1.0)
    # inverse OETF -> scene-linear [0, 1]
    lin = jnp.where(e <= 0.5,
                    (e * e) / 3.0,
                    (jnp.exp((e - c) / a) + b) / 12.0)
    # OOTF: display = peak * Ys^(gamma-1) * scene, gamma = 1.2 @1000 nits
    return peak_nits * lin  # per-channel; system gamma applied on luminance below


def _tonemap_luminance(y_rel, peak_rel, knee=0.75):
    """Knee rolloff on relative luminance (1.0 = SDR white).

    Identity below ``knee`` (SDR-range content passes through unchanged,
    like BT.2390's EETF), then a monotone Hermite rolloff mapping
    [knee, peak_rel] onto [knee, 1].
    """
    peak_rel = jnp.maximum(peak_rel, 1.0 + 1e-3)
    t = jnp.clip((y_rel - knee) / (peak_rel - knee), 0.0, 1.0)
    roll = knee + (1.0 - knee) * t * (2.0 - t)
    return jnp.where(y_rel <= knee, y_rel, roll)


# BT.2020 -> BT.601 (reference video.py:382-387)
_BT2020_TO_BT601 = jnp.array([
    [1.5540, -0.5143, -0.0397],
    [-0.1017, 1.1147, -0.0130],
    [-0.0163, -0.0886, 1.1049],
], jnp.float32)

# reference uses 4-decimal truncations of the BT.709 matrix (video.py:376-380)
_BT2020_TO_BT709_REF = jnp.array([
    [1.6605, -0.5876, -0.0728],
    [-0.1246, 1.1329, -0.0083],
    [-0.0182, -0.1006, 1.1187],
], jnp.float32)


def _hable(v, e=0.02):
    """Hable filmic curve, reference constants (video.py:356-358)."""
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, e, 0.30
    return ((v * (A * v + C * B) + D * E) / (v * (A * v + B) + D * F)) - E / F


def hdr2sdr_ref_float(rgb, trc: int, output_colorspace: str = "bt709",
                      pq_exposure: float = 110.0,
                      pq_white_point: float = 5.0,
                      hlg_exposure: float = 1.2,
                      hlg_white_point: float = 0.8,
                      hlg_saturation_gain: float = 0.9):
    """Reference-exact hdr2sdr (nunif/utils/video.py:309-417).

    float32 BT.2020 PQ/HLG-encoded RGB [0,1] -> BT.709/601 OETF RGB [0,1].
    """
    x = rgb.astype(jnp.float32)
    if trc == TRC_PQ:
        # SMPTE ST 2084 EOTF to [0,1] linear (reference video.py:330-334)
        m1 = 2610.0 / 16384.0
        m2 = 2523.0 / 4096.0 * 128.0
        c1 = 3424.0 / 4096.0
        c2 = 2413.0 / 4096.0 * 32.0
        c3 = 2392.0 / 4096.0 * 32.0
        p = jnp.power(x, 1.0 / m2)
        lin = jnp.power(jnp.maximum(p - c1, 0.0) / (c2 - c3 * p), 1.0 / m1)
        exposure, white, hable_e = pq_exposure, pq_white_point, 0.02
    else:
        a, b, c = 0.17883277, 0.28466892, 0.55991073
        lin = jnp.where(x <= 0.5,
                        (x * x) / 3.0,
                        (jnp.exp((x - c) / a) + b) / 12.0)
        exposure, white, hable_e = hlg_exposure, hlg_white_point, 0.01

    sdr = _hable(lin * exposure, hable_e) / _hable(
        jnp.asarray(white, jnp.float32), hable_e)
    if trc == TRC_HLG and hlg_saturation_gain < 1.0:
        luma = jnp.einsum("...c,c->...", sdr, jnp.array(
            [0.2126, 0.7152, 0.0722], jnp.float32))[..., None]
        sdr = sdr * hlg_saturation_gain + luma * (1.0 - hlg_saturation_gain)

    matrix = (_BT2020_TO_BT709_REF if output_colorspace == "bt709"
              else _BT2020_TO_BT601)
    out = jnp.clip(jnp.einsum("...c,dc->...d", sdr, matrix), 0.0, 1.0)
    # BT.709 piecewise OETF (reference video.py:394-398)
    out = jnp.where(out < 0.018,
                    out * 4.5,
                    1.099 * jnp.power(out, 0.45) - 0.099)
    return jnp.clip(out, 0.0, 1.0)


def hdr2sdr_float(rgb, trc: int, peak_nits: float):
    """float32 BT.2020 PQ/HLG-encoded RGB [0,1] -> BT.709 gamma-2.2 RGB [0,1]
    (``mode="bt2390"`` metadata-driven alternative; see module docstring)."""
    rgb = rgb.astype(jnp.float32)
    if trc == TRC_HLG:
        nits = hlg_eotf(rgb)
        peak_nits = min(peak_nits, 1000.0) if peak_nits > 0 else 1000.0
    else:
        nits = pq_eotf(rgb)
    rel = nits / SDR_WHITE_NITS
    peak_rel = max(peak_nits, SDR_WHITE_NITS + 1.0) / SDR_WHITE_NITS
    y = jnp.einsum("...c,c->...", rel, _Y2020)
    y_out = _tonemap_luminance(y, peak_rel)
    scale = y_out / jnp.maximum(y, 1e-6)
    rel = rel * scale[..., None]
    rgb709 = jnp.einsum("...c,dc->...d", rel, _BT2020_TO_BT709)
    # soft-clip out-of-gamut negatives by desaturating toward luminance
    y709 = jnp.clip(jnp.einsum(
        "...c,c->...", rgb709,
        jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)), 0.0, 1.0)
    neg = jnp.minimum(rgb709.min(axis=-1, keepdims=True), 0.0)
    denom = jnp.maximum(y709[..., None] - neg, 1e-6)
    rgb709 = y709[..., None] + (rgb709 - y709[..., None]) * (
        y709[..., None] / denom)
    rgb709 = jnp.clip(rgb709, 0.0, 1.0)
    return jnp.power(rgb709, 1.0 / 2.2)


@functools.partial(jax.jit, static_argnames=(
    "trc", "peak_nits", "out_uint16", "mode", "output_colorspace"))
def hdr2sdr_frames(frames, trc: int = TRC_PQ, peak_nits: float = 1000.0,
                   out_uint16: bool = False, mode: str = "hable",
                   output_colorspace: str = "bt709"):
    """uint8/uint16 BHWC HDR frames -> SDR frames of the same integer kind."""
    maxv = 65535.0 if frames.dtype == jnp.uint16 else 255.0
    x = frames.astype(jnp.float32) / maxv
    if mode == "hable":
        y = hdr2sdr_ref_float(x, trc, output_colorspace=output_colorspace)
    else:
        y = hdr2sdr_float(x, trc, peak_nits)
    if out_uint16:
        return (y * 65535.0 + 0.5).astype(jnp.uint16)
    return (y * 255.0 + 0.5).astype(jnp.uint8)


def choose_peak_nits(reader) -> float:
    """Pick the tone-map peak from stream HDR metadata (pyav_extra role)."""
    if getattr(reader, "master_max_luminance", 0) and \
            reader.master_max_luminance > SDR_WHITE_NITS:
        return float(reader.master_max_luminance)
    if getattr(reader, "max_cll", 0) and reader.max_cll > SDR_WHITE_NITS:
        return float(reader.max_cll)
    return 1000.0
