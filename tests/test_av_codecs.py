"""Real audio/video container decode: WAV (RIFF/PCM) and Y4M (YUV4MPEG2).

Pins the codec round-trips (encode -> decode recovers exact samples/planes),
the typed-error taxonomy for planted-broken payloads, the AvDecoder stage's
magic-byte dispatch, the O(sampled) frame-access contract (mutating an
unsampled frame cannot change the stats), and the AV fixture's goldens
against a fresh decode.
"""
import numpy as np
import pyarrow as pa
import pytest

from pdfray.core.wav import WavError, audio_stats, decode_wav, encode_wav
from pdfray.core.y4m import (
    SAMPLE_STRIDE,
    Y4mError,
    encode_y4m,
    parse_y4m,
    sample_stats,
)
from pdfray.pipelines.multimodal import AvDecoder
from pdfray.sources.fixtures import av_rows


def _wav(n=500, ch=2, rate=16000, seed=3, dtype=np.int16):
    rng = np.random.RandomState(seed)
    info = np.iinfo(dtype)
    s = rng.randint(info.min, info.max + 1, (n, ch)).astype(dtype)
    return s, encode_wav(s, rate)


@pytest.mark.parametrize(
    "dtype,ch,rate",
    [(np.int16, 1, 8000), (np.int16, 2, 44100), (np.uint8, 1, 22050),
     (np.int32, 2, 11025)],
)
def test_wav_roundtrip_exact_samples(dtype, ch, rate):
    s, payload = _wav(ch=ch, rate=rate, dtype=dtype)
    a = decode_wav(payload)
    assert a.sample_rate == rate
    assert a.n_channels == ch
    assert a.samples.dtype == np.dtype(dtype).newbyteorder("<") or \
        a.samples.dtype == np.dtype(dtype)
    assert (a.samples == s).all()


def test_wav_chunk_walk_skips_foreign_chunks_and_odd_padding():
    s = np.arange(33, dtype=np.uint8)[:, None]  # odd data length -> pad byte
    payload = encode_wav(s, 8000)
    assert len(payload) % 2 == 0
    # splice a LIST chunk between WAVE and fmt , as real encoders do
    spliced = payload[:12] + b"LIST\x04\x00\x00\x00INFO" + payload[12:]
    a = decode_wav(spliced)
    assert (a.samples[:, 0] == s[:, 0]).all()


def test_wav_stats_8bit_centering_and_duration():
    s = np.full((1600, 1), 128 + 50, np.uint8)  # constant +50 off center
    stats = audio_stats(decode_wav(encode_wav(s, 8000)))
    assert stats["duration_ms"] == 200
    assert stats["peak"] == 50
    assert stats["rms_x1e3"] == 50_000


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: b"",
        lambda p: b"RIFF" + p[4:8] + b"AVI " + p[12:],  # wrong form type
        lambda p: p[:40],  # truncated data chunk
        lambda p: p[:20] + b"\x03\x00" + p[22:],  # IEEE-float format tag
        lambda p: p[12:],  # fmt chunk never found
    ],
)
def test_wav_typed_errors(mutate):
    _, payload = _wav()
    with pytest.raises(WavError):
        decode_wav(mutate(payload))


def _frames(n=6, w=32, h=24, seed=1):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w), dtype=np.uint8) for _ in range(n)]


@pytest.mark.parametrize("cs", ["420jpeg", "420", "422", "444", "mono"])
def test_y4m_roundtrip_luma_exact(cs):
    frames = _frames()
    st = parse_y4m(encode_y4m(frames, colorspace=cs))
    assert (st.width, st.height, st.n_frames) == (32, 24, 6)
    for k, f in enumerate(frames):
        assert (st.luma(k) == f).all()


def test_y4m_default_colorspace_when_c_absent():
    payload = encode_y4m(_frames(2))
    stripped = payload.replace(b" C420jpeg", b"", 1)
    st = parse_y4m(stripped)
    assert st.colorspace == "420jpeg" and st.n_frames == 2


def test_y4m_sample_stats_touches_only_sampled_frames():
    frames = _frames(n=SAMPLE_STRIDE * 3)
    payload = encode_y4m(frames)
    base = sample_stats(parse_y4m(payload), SAMPLE_STRIDE)
    assert base["n_sampled"] == 3
    expect = sum(int(frames[k].astype(np.int64).sum())
                 for k in range(0, len(frames), SAMPLE_STRIDE))
    assert base["luma_sum"] == expect
    # corrupt an UNSAMPLED frame's luma in place: stats must not move
    st = parse_y4m(payload)
    mutated = bytearray(payload)
    off = st.frame_offsets[1]  # frame 1 is unsampled for stride >= 2
    mutated[off] ^= 0xFF
    assert sample_stats(parse_y4m(bytes(mutated)), SAMPLE_STRIDE) == base


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: b"",
        lambda p: b"JUNK" + p[4:],
        lambda p: p.replace(b" W32", b" W0", 1),
        lambda p: p.replace(b"C420jpeg", b"C999\x20\x20\x20\x20", 1),
        lambda p: p[:-5],  # truncated final frame
        lambda p: p.replace(b"FRAME\n", b"FLAME\n", 1),
    ],
)
def test_y4m_typed_errors(mutate):
    payload = encode_y4m(_frames())
    with pytest.raises(Y4mError):
        parse_y4m(mutate(payload))


def test_av_decoder_dispatch_and_error_capture():
    s, wav_payload = _wav(n=800, ch=1)
    y4m_payload = encode_y4m(_frames(4))
    batch = pa.table(
        {
            "url": pa.array(["a.wav", "v.y4m", "bad.bin", "trunc.wav"]),
            "payload": pa.array(
                [wav_payload, y4m_payload, b"\x00\x01garbage", wav_payload[:30]],
                pa.binary(),
            ),
        }
    )
    out = AvDecoder()(batch)
    rows = out.to_pylist()
    assert [r["media_type"] for r in rows] == [
        "audio", "video", "unknown", "audio"
    ]
    assert rows[0]["error"] is None and rows[0]["n_samples"] == 800
    assert rows[1]["error"] is None and rows[1]["n_frames"] == 4
    assert rows[2]["error"] and rows[2]["n_bytes"] == 9
    assert rows[3]["error"] and rows[3]["n_samples"] == 0
    with pytest.raises(Exception):
        AvDecoder(strict=True)(batch)


def test_av_fixture_goldens_match_fresh_decode():
    from pdfray.core.wav import decode_wav as dw

    n_checked = 0
    for url, payload, kind, golden in av_rows(60):
        dec = AvDecoder()(pa.table({
            "url": pa.array([url]), "payload": pa.array([payload], pa.binary()),
        })).to_pylist()[0]
        broken = "/broken/" in url
        assert (dec["error"] is not None) == broken, url
        for name, want in golden.items():
            assert dec[name] == want, (url, name, dec[name], want)
        n_checked += 1
    assert n_checked == 60


def test_spectral_stats_sawtooth_fundamental():
    """A pure sawtooth of period P in n samples puts the rfft argmax at
    bin n/P; dom_hz_x1e3 is the exact integer bin*rate*1000//n."""
    from pdfray.core.wav import decode_wav, encode_wav, spectral_stats

    saw = ((np.arange(2000) % 100) * 20).astype(np.int16)
    st = spectral_stats(decode_wav(encode_wav(saw, 8000)))
    assert st == {"dom_bin": 20, "dom_hz_x1e3": 80_000, "n_bins": 1001}


def test_spectral_stats_channel_mix_and_uint8():
    """Channels are mixed by integer SUM before the FFT (antiphase
    channels cancel: the fundamental vanishes from the mix), and 8-bit
    unsigned samples are centered before mixing (a DC-only uint8 signal
    has zero spectrum)."""
    from pdfray.core.wav import WavAudio, spectral_stats

    t = np.arange(1024)
    tone = (1000 * np.sin(2 * np.pi * 32 * t / 1024)).astype(np.int16)
    anti = np.stack([tone, -tone.astype(np.int16)], axis=1)
    st = spectral_stats(WavAudio(8000, anti))
    assert st["dom_bin"] != 32  # the mix cancelled the fundamental
    mono = spectral_stats(WavAudio(8000, tone[:, None]))
    assert mono["dom_bin"] == 32

    flat = np.full((512, 1), 128, np.uint8)  # DC only after centering
    st = spectral_stats(WavAudio(8000, flat))
    assert st["dom_bin"] == 0  # empty spectrum: argmax of all-zero mags

    tiny = np.zeros((1, 1), np.int16)
    assert spectral_stats(WavAudio(8000, tiny)) == {
        "dom_bin": 0, "dom_hz_x1e3": 0, "n_bins": 0,
    }


def test_segment_stats_runs_and_thresholds():
    """Hand-solved run-length case: three bursts with exact-silence gaps
    -> 8 windows of 256 over 2000 samples, runs [0..3] and [5..6]."""
    from pdfray.core.wav import WavAudio, segment_stats

    sig = np.zeros(2000, np.int16)
    sig[0:300], sig[700:1000], sig[1500:1600] = 5000, -4000, 3000
    st = segment_stats(WavAudio(8000, sig[:, None]))
    assert st == {
        "n_windows": 8, "n_active_windows": 6, "n_segments": 2,
        "longest_run": 4,
    }


def test_segment_stats_relative_threshold_and_edges():
    """The threshold is RELATIVE to the dtype's full scale: the same
    program encoded 8-bit and 16-bit segments identically.  The last
    partial window is judged on its own length, uint8 DC (=128) is
    silence, and n=0 returns all zeros."""
    from pdfray.core.wav import WavAudio, segment_stats

    prog = np.zeros(600, np.int64)
    prog[300:600] = 40  # mean |s| = 40/32768 of full scale when 16-bit
    st16 = segment_stats(WavAudio(8000, (prog * 1).astype(np.int16)[:, None]))
    st8 = segment_stats(
        WavAudio(8000, ((prog * 128) // 256 + 128).astype(np.uint8)[:, None])
    )
    # 16-bit: 40 > 32768/1024 = 32 -> active; 8-bit: 20 > 128/1024 -> active
    assert st16["n_active_windows"] == st8["n_active_windows"] == 2
    assert st16["n_segments"] == st8["n_segments"] == 1
    # window 2 is the partial one (600 = 2*256 + 88): its own length is
    # the denominator, so a quiet tail does not dilute below threshold
    assert st16["n_windows"] == 3
    flat = segment_stats(WavAudio(8000, np.full((512, 1), 128, np.uint8)))
    assert flat["n_active_windows"] == 0 and flat["n_segments"] == 0
    empty = segment_stats(WavAudio(8000, np.zeros((0, 1), np.int16)))
    assert empty == {
        "n_windows": 0, "n_active_windows": 0, "n_segments": 0,
        "longest_run": 0,
    }


def test_scene_stats_cut_threshold_and_edges():
    """A full-frame re-color is a cut (mean |diff| > 64); small motion is
    not; < 2 frames has no pairs; diff_total is the exact integer sum."""
    from pdfray.core.y4m import encode_y4m, parse_y4m, scene_stats

    frames = [np.full((16, 16), v, np.uint8) for v in (10, 12, 200, 201)]
    st = scene_stats(parse_y4m(encode_y4m(frames)))
    assert st == {"n_pairs": 3, "n_cuts": 1, "diff_total": (2 + 188 + 1) * 256}
    one = scene_stats(parse_y4m(encode_y4m(frames[:1])))
    assert one == {"n_pairs": 0, "n_cuts": 0, "diff_total": 0}
    # exactly AT the threshold is NOT a cut (strict >)
    pair = [np.zeros((16, 16), np.uint8), np.full((16, 16), 64, np.uint8)]
    assert scene_stats(parse_y4m(encode_y4m(pair)))["n_cuts"] == 0
    pair[1][:] = 65
    assert scene_stats(parse_y4m(encode_y4m(pair)))["n_cuts"] == 1


def test_fixture_scene_cuts_match_planted_boundaries():
    """The fixture's planted scene changes are the ONLY cuts: n_cuts ==
    number of scene boundaries for every unbroken video row (margins:
    in-scene motion stays below the threshold, re-colors far above)."""
    from pdfray.core.y4m import encode_y4m, parse_y4m, scene_stats
    from pdfray.sources.fixtures import _video_frames_arrays

    for k in range(1, 120, 2):
        frames, cs = _video_frames_arrays(k)
        # near-dup plants (k%16==15) carry the BASE clip's frames and
        # therefore the base's scene schedule (+noise, which must not
        # move any diff across the cut threshold)
        sched_k = k - 8 if k % 16 == 15 else k
        scene_len = 3 + (sched_k % 3)
        planted = sum(
            1
            for f in range(1, len(frames))
            if f // scene_len != (f - 1) // scene_len
        )
        st = scene_stats(parse_y4m(encode_y4m(frames, colorspace=cs)))
        assert st["n_cuts"] == planted, k
