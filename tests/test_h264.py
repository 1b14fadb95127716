"""The from-scratch intra-only H.264 codec (gcpde_spark/llm/h264.py):
encoder↔decoder round-trips across macroblock modes / QPs / sizes,
VLC-table structural soundness, malformed-input robustness, and the
declared out-of-scope boundary (inter slices, CABAC → None).

Validation boundary (module docstring): no codec library or external
conformance vectors exist in this environment, so these tests prove
internal consistency and structure, not conformance against a
reference decoder; the I_PCM path is table-free and exact by
construction."""

from __future__ import annotations

import random

import numpy as np
import pytest

from gcpde_spark.llm import h264 as H


def _grad(h, w):
    px = np.zeros((h, w, 3), np.uint8)
    px[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    px[:, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    px[:, :, 2] = 77
    px[h // 4 : h // 2, w // 4 : w // 2] = [255, 0, 0]
    return px


def _maxerr(a, b):
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def test_pcm_round_trip_is_colorspace_exact():
    """I_PCM carries raw YCbCr samples — the only loss is the 4:2:0
    colorspace floor (proven by comparing against a pure
    convert-and-back), never the codec."""
    px = _grad(48, 64)
    dec = H.h264_decode(H.h264_encode(px, mode="pcm"))
    Y, Cb, Cr = H._rgb_to_yuv420(px)
    floor = H._yuv420_to_rgb(Y.tolist(), Cb.tolist(), Cr.tolist(), 64, 48)
    assert _maxerr(dec, floor) == 0  # codec adds NOTHING over the floor


@pytest.mark.parametrize("mode", ["i16", "i4"])
@pytest.mark.parametrize("qp", [0, 8, 20])
def test_coded_round_trip_quality_tracks_qp(mode, qp):
    px = _grad(48, 64)
    enc = H.h264_encode(px, qp=qp, mode=mode)
    dec = H.h264_decode(enc)
    assert dec.shape == px.shape
    tol = {0: 7, 8: 9, 20: 18}[qp]
    assert _maxerr(dec, px) <= tol, (mode, qp, _maxerr(dec, px))
    # and it actually compresses relative to raw + to PCM
    assert len(enc) < len(H.h264_encode(px, mode="pcm"))


def test_coded_residuals_add_almost_nothing_over_pcm_at_qp0():
    """At QP 0 the transform-coded modes must land within a couple of
    codes of the lossless PCM reconstruction even on pure noise — the
    whole CAVLC/transform/prediction chain, worst-case input."""
    noise = np.random.default_rng(5).integers(0, 256, (32, 32, 3), "int64")
    noise = noise.astype(np.uint8)
    ref = H.h264_decode(H.h264_encode(noise, mode="pcm"))
    for mode in ("i16", "i4"):
        dec = H.h264_decode(H.h264_encode(noise, qp=0, mode=mode))
        assert _maxerr(dec, ref) <= 3, mode


def test_non_multiple_of_16_crops_and_odd_evenizes():
    px = _grad(36, 52)
    dec = H.h264_decode(H.h264_encode(px, qp=8, mode="i16"))
    assert dec.shape == (36, 52, 3)
    # odd sizes are unrepresentable in 4:2:0 cropping → evenized
    odd = px[:35, :51]
    dec2 = H.h264_decode(H.h264_encode(odd, qp=8, mode="i4"))
    assert dec2.shape == (36, 52, 3)
    # compare against the PCM (lossless-over-the-4:2:0-floor) decode:
    # the odd crop puts sharp edges on odd pixels, so chroma
    # subsampling alone costs ~100 vs the SOURCE — that floor is not
    # the codec's error
    floor = H.h264_decode(H.h264_encode(odd, mode="pcm"))
    assert _maxerr(dec2, floor) <= 12


def test_i4_mode_signaling_exercises_many_prediction_modes():
    """The SAD-picking encoder must actually spread across intra4x4
    modes on structured content (so the decoder's mode machinery —
    neighbor-predicted signaling included — is exercised, not just
    DC), and the decode must still reconstruct."""
    rng = np.random.default_rng(11)
    px = np.zeros((64, 64, 3), np.uint8)
    px[:, :, 0] = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (64, 1))
    px[:, :, 1] = px[:, :, 0].T
    px[:, :, 2] = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    enc = H.h264_encode(px, qp=6, mode="i4")
    dec = H.h264_decode(enc)
    floor = H.h264_decode(H.h264_encode(px, mode="pcm"))
    assert _maxerr(dec, floor) <= 10  # vs the 4:2:0 floor, not the src
    # count the modes the encoder chose by re-walking its own decision
    # path through the decoder's bookkeeping
    nals = list(H._iter_annexb_nals(enc))
    sps = H._parse_sps(H._unescape_rbsp(nals[0][1:]))
    pps = H._parse_pps(H._unescape_rbsp(nals[1][1:]))
    ctx = H._MBCtx(sps["mb_width"], sps["mb_height"])
    Y = [[0] * (sps["mb_width"] * 16) for _ in range(sps["mb_height"] * 16)]
    Cb = [[128] * (sps["mb_width"] * 8) for _ in range(sps["mb_height"] * 8)]
    Cr = [[128] * (sps["mb_width"] * 8) for _ in range(sps["mb_height"] * 8)]
    H._decode_slice(
        H._Bits(H._unescape_rbsp(nals[2][1:])), sps, pps, Y, Cb, Cr, ctx, 5
    )
    used = {m for row in ctx.i4_modes for m in row if m >= 0}
    assert len(used) >= 4, used  # several distinct intra4x4 modes


def test_vlc_tables_are_prefix_free():
    """Structural soundness of every transcribed VLC table: no
    duplicate codes, no code a prefix of another (a violation makes
    some bitstream undecodable or ambiguous)."""
    def check(pairs, name):
        codes = [(ln, b) for ln, b in pairs if ln > 0]
        assert len(set(codes)) == len(codes), f"{name}: duplicate codes"
        for l1, b1 in codes:
            for l2, b2 in codes:
                assert not (l1 < l2 and (b2 >> (l2 - l1)) == b1), (
                    f"{name}: ({l1},{b1:b}) prefixes ({l2},{b2:b})"
                )

    for ctx in range(4):
        check(list(zip(H._CT_LEN[ctx], H._CT_BITS[ctx])), f"coeff_token{ctx}")
    for tc, row in enumerate(H._TZ, 1):
        check(row, f"total_zeros{tc}")
    for tc, row in enumerate(H._TZ_CDC, 1):
        check(row, f"chroma_dc_tz{tc}")
    for zl, row in enumerate(H._RUN, 1):
        check(row, f"run_before{zl}")


def test_residual_block_round_trip_fuzz():
    """Write→read every residual-block shape: random sparsity, all nC
    contexts, trailing-ones edge cases, level-escape magnitudes."""
    rng = random.Random(42)
    for _ in range(4000):
        mc = rng.choice([4, 15, 16])
        nc = -1 if mc == 4 else rng.choice([0, 1, 2, 3, 4, 5, 7, 8, 16])
        coeffs = [0] * mc
        for p in rng.sample(range(mc), rng.randint(0, mc)):
            coeffs[p] = rng.choice(
                [1, -1, 1, -1, 2, -2, 3, -3, 7, -20, 100, -300, 2000, -2000]
            )
        w = H._BitW()
        H._write_residual(w, coeffs, mc, nc)
        w.byte_align_zero()
        assert H._read_residual(H._Bits(w.bytes()), mc, nc) == coeffs


def test_out_of_scope_and_malformed_return_none():
    px = _grad(32, 32)
    enc = bytearray(H.h264_encode(px, qp=8, mode="i16"))
    # flip the slice NAL type to non-IDR P-ish content: find the IDR
    # start code and rewrite slice_type by corrupting — simplest true
    # inter case: hand-build a P slice header under the same SPS/PPS
    nals = list(H._iter_annexb_nals(bytes(enc)))
    w = H._BitW()
    w.ue(0)  # first_mb
    w.ue(5)  # slice_type P
    w.ue(0)
    w.u(0, 4)
    w.trailing()
    p_slice = b"\x00\x00\x00\x01" + bytes([0x41]) + H._escape_rbsp(w.bytes())
    stream = (
        b"\x00\x00\x00\x01" + bytes([0x67]) + H._escape_rbsp(H._encode_sps(2, 2, 32, 32))
        + b"\x00\x00\x00\x01" + bytes([0x68]) + H._escape_rbsp(H._encode_pps(26))
        + p_slice
    )
    assert H.h264_decode(stream) is None  # inter: declared boundary
    assert H.h264_decode(b"") is None
    assert H.h264_decode(b"\x00\x00\x01\x67\xff") is None
    # truncations and bit flips never raise
    full = bytes(enc)
    for cut in range(0, len(full), 53):
        out = H.h264_decode(full[:cut])
        assert out is None or out.shape[2] == 3
    rng = random.Random(7)
    b = bytearray(full)
    for _ in range(120):
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        out = H.h264_decode(bytes(b))
        assert out is None or out.shape[2] == 3


def test_avcc_sample_decode_matches_annexb():
    """The MP4 path: SPS/PPS via an avcC record + a length-prefixed
    sample must decode identically to the Annex-B stream."""
    px = _grad(32, 48)
    enc = H.h264_encode(px, qp=8, mode="i16")
    nals = list(H._iter_annexb_nals(enc))
    sps_nal, pps_nal, idr_nal = nals
    avcc = (
        bytes([1, 66, 0xC0, 20, 0xFF, 0xE1])
        + len(sps_nal).to_bytes(2, "big") + sps_nal
        + bytes([1])
        + len(pps_nal).to_bytes(2, "big") + pps_nal
    )
    sample = len(idr_nal).to_bytes(4, "big") + idr_nal
    via_avcc = H.h264_decode_avcc(avcc, sample)
    via_annexb = H.h264_decode(enc)
    assert np.array_equal(via_avcc, via_annexb)
    assert H.h264_decode_avcc(b"", sample) is None
    assert H.h264_decode_avcc(avcc, b"\x00\x00") is None
