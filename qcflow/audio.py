"""Dependency-free audio codecs + deterministic waveform synthesis (numpy).

Two codecs keep decode exactly reproducible with no external libraries:
``pcm16`` (little-endian int16) and ``ulaw`` (ITU-T G.711 mu-law). The
synthesis is a seeded sum of sinusoids + noise whose parameters derive only
from the clip index, so any executor can re-synthesize the original float
waveform from ``clip_id`` alone — that is what makes the per-row PCM
invariant (SNR >= 30 dB vs the original) checkable in a distributed run
without shipping the original around.
"""

from __future__ import annotations

import numpy as np

VALID_SR = (8000, 16000, 22050, 44100, 48000)
KNOWN_CODECS = ("pcm16", "ulaw")

_MU = 255.0
_BIAS = 0x84  # 132, standard G.711 bias
_CLIP = 32635


def pcm16_encode(x: np.ndarray) -> bytes:
    """float32 [-1, 1] -> little-endian int16 bytes."""
    q = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    return q.tobytes()


def pcm16_decode(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<i2").astype(np.float32) / 32767.0


def ulaw_encode(x: np.ndarray) -> bytes:
    """float32 [-1, 1] -> G.711 mu-law bytes (vectorized reference form)."""
    pcm = np.clip(np.round(x * 32767.0), -_CLIP, _CLIP).astype(np.int32)
    sign = np.where(pcm < 0, 0x80, 0x00).astype(np.int32)
    mag = np.abs(pcm) + _BIAS
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)  # mag >= 132 -> exp >= 0
    exp = np.clip(exp, 0, 7)
    mantissa = (mag >> (exp + 3)) & 0x0F
    u = ~(sign | (exp << 4) | mantissa) & 0xFF
    return u.astype(np.uint8).tobytes()


def ulaw_decode(b: bytes) -> np.ndarray:
    u = (~np.frombuffer(b, dtype=np.uint8).astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = ((mantissa << 3) + _BIAS) << exp
    mag = mag - _BIAS
    pcm = np.where(sign != 0, -mag, mag)
    return pcm.astype(np.float32) / 32767.0


def decode(b: bytes, codec: str) -> np.ndarray:
    if codec == "pcm16":
        return pcm16_decode(b)
    if codec == "ulaw":
        return ulaw_decode(b)
    raise ValueError(f"unknown codec: {codec}")


def synth_wave(idx: int, n_samples: int, sr: int) -> np.ndarray:
    """Deterministic waveform for clip index ``idx``: 2-3 sinusoids + noise.

    Parameters come from a counter-based RNG keyed only by the index, so the
    exact same float32 array is reproducible anywhere (generator, labeler,
    executor-side SNR checks)."""
    rng = np.random.default_rng([7919, idx])
    n_tones = int(rng.integers(2, 4))
    t = np.arange(n_samples, dtype=np.float64) / max(sr, 1)
    x = np.zeros(n_samples, dtype=np.float64)
    for _ in range(n_tones):
        f = float(rng.uniform(80.0, min(3800.0, sr / 2 - 50) if sr > 1000 else 3800.0))
        a = float(rng.uniform(0.1, 0.3))
        ph = float(rng.uniform(0, 2 * np.pi))
        x += a * np.sin(2 * np.pi * f * t + ph)
    x += rng.normal(0.0, 0.01, n_samples)
    return np.clip(x, -0.999, 0.999).astype(np.float32)


def snr_db(ref: np.ndarray, est: np.ndarray) -> float:
    """Signal-to-noise ratio of ``est`` against ``ref`` in dB."""
    n = min(len(ref), len(est))
    if n == 0:
        return float("-inf")
    ref = ref[:n].astype(np.float64)
    err = ref - est[:n].astype(np.float64)
    p_sig = float(np.sum(ref * ref))
    p_err = float(np.sum(err * err))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)


def snr_vs_synth(idx: int, est: np.ndarray, sr: int, block: int = 16384) -> float:
    """SNR of ``est`` against the re-synthesized original, computed in
    L2-resident blocks: identical math to ``synth_wave`` (elementwise ops
    chunk exactly; Generator.normal chunk-draws equal one-shot draws) but
    ~10 MB/row of DRAM traffic becomes ~0.5 MB — the difference between a
    memory-bandwidth-bound and CPU-bound invariant check at high
    parallelism."""
    rng = np.random.default_rng([7919, idx])
    n = len(est)
    if n == 0:
        return float("-inf")
    n_tones = int(rng.integers(2, 4))
    tones = []
    for _ in range(n_tones):
        f = float(rng.uniform(80.0, min(3800.0, sr / 2 - 50) if sr > 1000 else 3800.0))
        a = float(rng.uniform(0.1, 0.3))
        ph = float(rng.uniform(0, 2 * np.pi))
        tones.append((f, a, ph))
    p_sig = 0.0
    p_err = 0.0
    for s in range(0, n, block):
        e = min(s + block, n)
        t = np.arange(s, e, dtype=np.float64) / max(sr, 1)
        x = np.zeros(e - s, dtype=np.float64)
        for f, a, ph in tones:
            x += a * np.sin(2 * np.pi * f * t + ph)
        x += rng.normal(0.0, 0.01, e - s)
        ref = np.clip(x, -0.999, 0.999).astype(np.float32).astype(np.float64)
        err = ref - est[s:e].astype(np.float64)
        p_sig += float(np.sum(ref * ref))
        p_err += float(np.sum(err * err))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)


# ----------------------------------------------- spectral fingerprint

FP_SEGMENTS = 5  # time segments -> FP_SEGMENTS - 1 transitions
FP_BANDS = 17  # log-spaced energy bands -> FP_BANDS - 1 band diffs


def audio_fp64(x: np.ndarray, sr: int) -> int:
    """64-bit spectral fingerprint of a decoded clip, in the classic
    band-energy-delta-sign family (Haitsma & Kalker's robust hashing
    scheme, reduced to one word per clip): split the clip into 5 equal
    time segments, measure energy in 17 log-spaced frequency bands per
    segment (one rFFT each), and take

        bit(t, b) = [(E[t,b] - E[t,b+1]) - (E[t+1,b] - E[t+1,b+1])] > 0

    for t = 0..3, b = 0..15 — the sign of the time-delta of the band
    difference, 4 x 16 = 64 bits packed as a signed int64 (bit k =
    t * 16 + b). Sign bits are invariant to global gain and robust to
    low-amplitude additive noise, so jittered or transcoded copies stay
    within a small Hamming radius while distinct content diverges to
    ~32. Deterministic pure-numpy; zero/empty input -> fingerprint 0."""
    n = len(x)
    # seg >= 2 keeps the rFFT bin grid non-degenerate (n_bins >= 2)
    if n < 2 * FP_SEGMENTS:
        return 0
    sr = int(sr) if sr and sr > 0 else 8000
    seg = n // FP_SEGMENTS
    frames = (
        x[: seg * FP_SEGMENTS].astype(np.float64).reshape(FP_SEGMENTS, seg)
    )
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (5, seg//2 + 1)
    n_bins = spec.shape[1]
    freqs = np.arange(n_bins, dtype=np.float64) * (sr / (2.0 * (n_bins - 1)))
    f_lo, f_hi = 100.0, max(0.45 * sr, 400.0)
    edges = np.exp(np.linspace(np.log(f_lo), np.log(f_hi), FP_BANDS + 1))
    idx = np.searchsorted(freqs, edges)
    e = np.zeros((FP_SEGMENTS, FP_BANDS), dtype=np.float64)
    for b in range(FP_BANDS):
        lo, hi = idx[b], max(idx[b + 1], idx[b] + 1)  # >= 1 bin per band
        e[:, b] = spec[:, lo:hi].sum(axis=1)
    d = e[:, :-1] - e[:, 1:]  # (5, 16) band diffs
    bits = (d[:-1, :] - d[1:, :]) > 0  # (4, 16) transition signs
    word = np.uint64(0)
    flat = bits.reshape(-1)  # k = t * 16 + b
    for k in np.nonzero(flat)[0]:
        word |= np.uint64(1) << np.uint64(k)
    return int(word.astype(np.int64))


def fp_hamming(a: int, b: int) -> int:
    """Hamming distance between two packed 64-bit fingerprints."""
    return int(bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1"))


# ----------------------------------------------- sample-rate conversion

RS_HALF = 16  # 32-tap windowed-sinc interpolation kernel

# polyphase tap bank per (sr_in, sr_out, half): the fractional tap
# phase (m*sr_in mod sr_out)/sr_out repeats with period
# L = sr_out / gcd(sr_in, sr_out) (L <= 320 for every VALID_SR pair),
# so the windowed-sinc rows are computed ONCE per rate pair per
# process instead of per output sample — measured ~20x on the bench's
# normalize stage. The bank rows are produced by the IDENTICAL
# expressions on the IDENTICAL float64 phase values the inline path
# used, so outputs stay bit-identical (the md5 construction-truth
# gates pin this).
_RS_BANK_MAX_L = 4096
_RS_BANK: dict = {}


def _rs_bank(sr_in: int, sr_out: int, half: int):
    import math

    key = (sr_in, sr_out, half)
    bank = _RS_BANK.get(key)
    if bank is None:
        g = math.gcd(sr_in, sr_out)
        L = sr_out // g
        if L > _RS_BANK_MAX_L:
            return None  # degenerate ratio: fall back to inline taps
        fc = min(1.0, sr_out / sr_in)
        offs = np.arange(-half + 1, half + 1, dtype=np.int64)
        rem = (np.arange(L, dtype=np.int64) * g).astype(np.float64)
        frac = rem / sr_out
        u = offs[None, :].astype(np.float64) - frac[:, None]
        w = 0.5 + 0.5 * np.cos(np.pi * u / half)
        h = fc * np.sinc(fc * u) * w
        h /= h.sum(axis=1, keepdims=True)
        bank = (g, h)
        _RS_BANK[key] = bank
    return bank


def resample(
    x: np.ndarray,
    sr_in: int,
    sr_out: int,
    half: int = RS_HALF,
    block: int = 8192,
) -> np.ndarray:
    """Rational sample-rate conversion by windowed-sinc interpolation:
    output sample m sits at input position t = m * sr_in / sr_out and is
    a 2*half-tap Hann-windowed sinc dot product around t, with the sinc
    cutoff at the LOWER of the two Nyquists (anti-aliasing on
    downsample). Rows are DC-normalized (each tap row divided by its
    sum) so constant signals pass through exactly. The tap phase is
    derived with INTEGER arithmetic (m*sr_in divmod sr_out), so the
    output is bit-identical for any block size / partition layout — the
    per-output-sample dot product never spans a block boundary. Output
    length floor(n * sr_out / sr_in); identical rates return the input
    unchanged. O(n_out * taps) and L2-blocked like the other kernels."""
    n = len(x)
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError(f"bad sample rates: {sr_in} -> {sr_out}")
    if sr_in == sr_out:
        return x.astype(np.float32)
    n_out = n * sr_out // sr_in
    if n == 0 or n_out == 0:
        return np.zeros(0, dtype=np.float32)
    xi = np.pad(x.astype(np.float64), (half, half))
    fc = min(1.0, sr_out / sr_in)
    offs = np.arange(-half + 1, half + 1, dtype=np.int64)  # 2*half taps
    bank = _rs_bank(sr_in, sr_out, half)
    out = np.empty(n_out, dtype=np.float64)
    if bank is not None and n_out >= 4 * bank[1].shape[0]:
        # Per-phase strided path (bit-identical to the blocked gather
        # below, measured ~2.2x): outputs in the same residue class
        # r = m mod L share one bank row AND their windows start at
        # arithmetic positions k0 = base_r + j*(sr_in/g), so each class
        # is a pure strided view into the sliding-window view of xi —
        # no (block, taps) int64 index build and no row gather. The
        # per-output dot product is the IDENTICAL multiply +
        # .sum(axis=1) pairwise reduction over the identical float64
        # values (window start = k0 - half + 1 + half = k0 + 1), so
        # outputs match the gather path bit for bit (verified across
        # every VALID_SR pair and the speed-perturb ratios).
        g, hb = bank
        L = hb.shape[0]
        a = sr_in // g
        win = np.lib.stride_tricks.sliding_window_view(xi, 2 * half)
        for r in range(min(L, n_out)):
            cnt = (n_out - r + L - 1) // L
            num0 = r * sr_in
            k0b = num0 // sr_out
            p = (num0 - k0b * sr_out) // g
            rows = win[k0b + 1 :: a][:cnt]
            out[r::L] = (rows * hb[p]).sum(axis=1)
        return np.clip(out, -1.0, 1.0).astype(np.float32)
    for s in range(0, n_out, block):
        e = min(s + block, n_out)
        num = np.arange(s, e, dtype=np.int64) * sr_in
        k0 = num // sr_out
        if bank is not None:
            g, hb = bank
            h = hb[(num - k0 * sr_out) // g]
        else:
            frac = (num - k0 * sr_out).astype(np.float64) / sr_out
            u = offs[None, :].astype(np.float64) - frac[:, None]
            w = 0.5 + 0.5 * np.cos(np.pi * u / half)  # |u| <= half
            h = fc * np.sinc(fc * u) * w
            h = h / h.sum(axis=1, keepdims=True)
        idx = k0[:, None] + offs[None, :] + half
        out[s:e] = (xi[idx] * h).sum(axis=1)
    return np.clip(out, -1.0, 1.0).astype(np.float32)


# ----------------------------------------------- loudness normalization

TARGET_RMS = 0.1  # ~ -20 dBFS, the common speech-corpus level target
MAX_GAIN = 16.0  # +24 dB cap: never amplify near-silence into noise


def loudness_gain(
    x: np.ndarray,
    target_rms: float = TARGET_RMS,
    max_gain: float = MAX_GAIN,
    block: int = 1 << 16,
) -> tuple[float, float, bool]:
    """Per-clip loudness normalization parameters from decoded samples:
    (rms, gain_db, clip_after). Gain drives the clip to ``target_rms``,
    capped at ``max_gain``; ``clip_after`` flags clips whose peak would
    exceed full scale after the gain (a real pipeline routes those to a
    limiter). Blocked float64 sums keep the working set L2-resident
    (same rationale as ``snr_vs_synth``); the block size is part of the
    arithmetic (np.sum's pairwise grouping differs per block), so every
    caller — fixture build and executor alike — must use the default,
    which is what makes the construction-truth gate bit-exact."""
    n = len(x)
    if n == 0:
        return 0.0, 20.0 * float(np.log10(max_gain)), False
    acc = 0.0
    peak = 0.0
    for s in range(0, n, block):
        seg = x[s : s + block].astype(np.float64)
        acc += float(np.sum(seg * seg))
        peak = max(peak, float(np.max(np.abs(seg))))
    rms = float(np.sqrt(acc / n))
    gain = max_gain if rms == 0.0 else min(target_rms / rms, max_gain)
    return rms, 20.0 * float(np.log10(gain)), bool(peak * gain > 1.0)


# ----------------------------------------------- fixed-window segmentation

SEG_WIN_MS = 400  # training-segment window
SEG_MIN_TAIL_FRAC = 0.5  # keep a trailing partial segment iff >= half a window


def segment_bounds(
    n: int, win_n: int, min_tail_frac: float = SEG_MIN_TAIL_FRAC
) -> list[tuple[int, int]]:
    """Fixed-window segmentation bounds over an ``n``-sample clip:
    consecutive [start, end) windows of ``win_n`` samples; the trailing
    partial window is kept (at its true length) iff it holds at least
    ``ceil(win_n * min_tail_frac)`` samples, else dropped. Pure integer
    arithmetic — the construction-truth gate compares segment payloads
    byte-exactly, so the bounds must be identical on any host."""
    if win_n <= 0:
        raise ValueError(f"win_n must be positive, got {win_n}")
    import math

    min_keep = max(1, math.ceil(win_n * min_tail_frac))
    bounds = [(s, min(n, s + win_n)) for s in range(0, n, win_n)]
    if bounds and (bounds[-1][1] - bounds[-1][0]) < min_keep:
        bounds.pop()
    return bounds


# ----------------------------------------------- noise augmentation

NOISE_SNR_DB = 20.0  # default augmentation SNR


def noise_augment(
    x: np.ndarray,
    key: int,
    snr_db: float = NOISE_SNR_DB,
    seed: int = 424242,
    block: int = 1 << 16,
) -> np.ndarray:
    """Deterministic additive-noise augmentation: white Gaussian noise
    scaled so signal/noise power = ``snr_db``, generated by a
    counter-based rng seeded with (seed, key) — so the SAME clip under
    the SAME key yields byte-identical output on any executor, any
    partition layout, any retry (the construction-truth gate compares
    md5). Blocked float64 power sum like ``loudness_gain`` (the block
    size is part of the arithmetic — every caller must use the
    default). Digitally-silent clips pass through unchanged (no signal
    power to scale against)."""
    n = len(x)
    if n == 0:
        return x.astype(np.float32)
    acc = 0.0
    for s in range(0, n, block):
        seg = x[s : s + block].astype(np.float64)
        acc += float(np.sum(seg * seg))
    rms = float(np.sqrt(acc / n))
    if rms == 0.0:
        return x.astype(np.float32)
    sigma = rms / (10.0 ** (snr_db / 20.0))
    rng = np.random.default_rng([seed, int(key) & 0x7FFFFFFFFFFFFFFF])
    y = x.astype(np.float64) + rng.normal(0.0, sigma, n)
    return np.clip(y, -1.0, 1.0).astype(np.float32)


# ----------------------------------------------- band-energy features

FEAT_BANDS = 16


def band_features(x: np.ndarray, sr: int, bands: int = FEAT_BANDS) -> np.ndarray:
    """Log band-energy feature vector — the FLOAT sibling of the hash
    fingerprint (audio_fp64): one rFFT over the whole clip, energy
    summed into ``bands`` log-spaced frequency bands (same 100 Hz ..
    0.45*sr layout as the fingerprint), log10 with a 1e-12 floor,
    float32. Deterministic pure numpy, so executor output is
    bit-identical to build-time truth. The vector feeds the ANN family
    (brute-force / IVF / PQ over audio-derived embeddings) the way the
    64-bit fingerprint feeds the banded Hamming join. Too-short or
    empty clips return the all-floor vector."""
    n = len(x)
    sr = int(sr) if sr and sr > 0 else 8000
    out = np.full(bands, np.log10(1e-12), dtype=np.float64)
    if n < 4:
        return out.astype(np.float32)
    spec = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    n_bins = len(spec)
    freqs = np.arange(n_bins, dtype=np.float64) * (sr / (2.0 * (n_bins - 1)))
    f_lo, f_hi = 100.0, max(0.45 * sr, 400.0)
    edges = np.exp(np.linspace(np.log(f_lo), np.log(f_hi), bands + 1))
    idx = np.searchsorted(freqs, edges)
    for b in range(bands):
        lo, hi = idx[b], max(idx[b + 1], idx[b] + 1)
        out[b] = np.log10(spec[lo:hi].sum() + 1e-12)
    return out.astype(np.float32)
