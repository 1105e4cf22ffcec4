"""Mixer/DSP ops vs an independent per-sample numpy reference
(lib/audio/mixer.c semantics)."""

import math

import numpy as np
import pytest

from asciichat_tpu.ops import audio as A


def _np_soft_clip(x, thr=0.7, steep=3.0):
    if x > thr:
        return thr + (1.0 - thr) * math.tanh((x - thr) * steep)
    if x < -thr:
        return -thr + (-1.0 + thr) * math.tanh((x + thr) * steep)
    return x


def _np_mixer(samples, active, params: A.MixerParams, exclude_self=True):
    """Frame-loop reference mirroring mixer.c:491-633 (shared env/duck,
    per-client compressor as documented in ops/audio.py)."""
    s_count, n = samples.shape
    c_count = s_count if exclude_self else 1
    env = np.zeros(s_count)
    duck = np.ones(s_count)
    cenv = np.zeros(c_count)
    cgain = np.ones(c_count)
    out = np.zeros((c_count, n))
    p = params
    d2l = lambda db: 10.0 ** (db / 20.0)
    l2d = lambda x: 20.0 * math.log10(max(x, 1e-12))

    def ar(val, tgt, att, rel):
        # envelope: attack when level rises (mixer.c:92-95)
        coeff = att if tgt > val else rel
        return coeff * val + (1 - coeff) * tgt

    def gs(val, tgt, att, rel):
        # gain: attack when gain falls (mixer.c:102-106, 209-214)
        coeff = att if tgt < val else rel
        return coeff * val + (1 - coeff) * tgt

    for f0 in range(0, n, A.MIXER_FRAME_SIZE):
        f1 = min(f0 + A.MIXER_FRAME_SIZE, n)
        chunk = samples[:, f0:f1] * active[:, None]
        for i in range(s_count):
            if active[i]:
                peak = np.max(np.abs(chunk[i]))
                env[i] = ar(env[i], peak, p.duck_attack_coeff, p.duck_release_coeff)
        speaking_count = sum(1 for i in range(s_count) if active[i] and env[i] > d2l(-60.0))
        env_db = np.array([l2d(e) for e in env])
        max_db = env_db.max()
        for i in range(s_count):
            is_speak = env_db[i] > p.duck_threshold_db
            is_leader = is_speak and env_db[i] >= max_db - p.duck_margin_db
            tgt = d2l(p.duck_atten_db) if (is_speak and not is_leader) else 1.0
            duck[i] = gs(duck[i], tgt, p.duck_attack_coeff, p.duck_release_coeff)
        speaking = [bool(active[i]) and env[i] > d2l(-60.0)
                    for i in range(s_count)]
        weighted0 = chunk * (duck * active)[:, None]
        full0 = weighted0.sum(axis=0)
        if exclude_self:
            # reference exclude path: the LISTENER is masked out before
            # counting speakers (mixer.c:663-665,780-787), so listener c's
            # crowd gain is 1/count(speakers != c)^alpha
            mixes = np.zeros((c_count, f1 - f0))
            for c in range(c_count):
                cnt = speaking_count - (1 if speaking[c] else 0)
                crowd_c = 1.0 / (cnt ** p.crowd_alpha) if cnt > 0 else 1.0
                mixes[c] = (full0 - weighted0[c]) * (p.base_gain * crowd_c)
        else:
            crowd = (1.0 / (speaking_count ** p.crowd_alpha)
                     if speaking_count > 0 else 1.0)
            mixes = full0[None, :] * (p.base_gain * crowd)
        for c in range(c_count):
            fp = np.max(np.abs(mixes[c]))
            cenv[c] = ar(cenv[c], fp, p.comp_attack_coeff, p.comp_release_coeff)
            level = l2d(cenv[c])
            over = level - p.comp_threshold_db
            knee = p.comp_knee_db
            slope = 1.0 / p.comp_ratio - 1.0
            if over <= -knee / 2:
                gr = 0.0
            elif over >= knee / 2:
                gr = slope * over
            else:
                x = over + knee / 2
                gr = slope * x * x / (2 * knee)
            tgt = d2l(gr + p.comp_makeup_db)
            cgain[c] = gs(cgain[c], tgt, p.comp_attack_coeff, p.comp_release_coeff)
            out[c, f0:f1] = [_np_soft_clip(v, p.clip_threshold, p.clip_steepness)
                             for v in mixes[c] * cgain[c]]
    return out


@pytest.mark.parametrize("exclude_self", [True, False])
def test_mixer_matches_reference(exclude_self):
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    S, N = 4, 480
    samples = (rng.normal(0, 0.2, (S, N)) * np.sin(np.arange(N) / 7)).astype(np.float32)
    samples[1] *= 3.0  # loud leader triggers ducking of others
    active = np.array([True, True, True, False])
    p = A.MixerParams()
    state = A.MixerState.init(S, S if exclude_self else 1).astuple()
    got, _ = A.mixer_process(jnp.asarray(samples), jnp.asarray(active), state,
                             p, exclude_self=exclude_self)
    want = _np_mixer(samples.astype(np.float64), active.astype(np.float64), p, exclude_self)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_mixer_state_carries_across_ticks():
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    S, N = 3, 480
    p = A.MixerParams()
    active = jnp.ones(S, bool)
    state = A.MixerState.init(S, S).astuple()
    a = rng.normal(0, 0.3, (S, N)).astype(np.float32)
    b = rng.normal(0, 0.3, (S, N)).astype(np.float32)
    out1, state = A.mixer_process(jnp.asarray(a), active, state, p)
    out2, state = A.mixer_process(jnp.asarray(b), active, state, p)
    # two-tick run == reference over the concatenation
    want = _np_mixer(np.concatenate([a, b], axis=1).astype(np.float64), np.ones(S), p)
    got = np.concatenate([np.asarray(out1), np.asarray(out2)], axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_exclude_self_removes_own_audio():
    import jax.numpy as jnp

    S, N = 2, 256
    samples = np.zeros((S, N), np.float32)
    samples[0] = 0.5  # only source 0 speaks
    state = A.MixerState.init(S, S).astuple()
    out, _ = A.mixer_process(jnp.asarray(samples), jnp.ones(S, bool), state)
    out = np.asarray(out)
    assert np.all(out[0] == 0.0)  # own audio excluded -> silence
    assert np.max(np.abs(out[1])) > 0.01  # hears source 0


def test_soft_clip_limits():
    import jax.numpy as jnp

    x = jnp.asarray([0.0, 0.5, 0.9, 5.0, -5.0])
    y = np.asarray(A.soft_clip(x, 0.7, 3.0))
    assert y[0] == 0.0 and y[1] == 0.5
    assert 0.7 < y[2] < 0.9
    # float32 tanh saturates to exactly 1.0 for large inputs (same as C)
    assert y[3] <= 1.0 and y[4] >= -1.0


def test_resample_linear_endpoints():
    import jax.numpy as jnp

    buf = jnp.asarray(np.arange(10, dtype=np.float32))
    out = np.asarray(A.resample_linear(buf, 19))
    # reference stride semantics (audio.c:586): pos[i] = i * n/out_len with
    # end-clamp — NOT endpoint-matched interpolation
    assert out[0] == 0.0 and abs(out[-1] - 9.0) < 1e-5
    np.testing.assert_allclose(out[1], 10.0 / 19.0, atol=1e-5)


def test_filters_impulse():
    import jax.numpy as jnp

    x = np.zeros(64, np.float32)
    x[0] = 1.0
    alpha = A.lowpass_alpha(1000.0)
    out, _ = A.lowpass(jnp.asarray(x), jnp.float32(0.0), alpha)
    out = np.asarray(out)
    # y[0]=alpha, y[n]=alpha*(1-alpha)^n impulse response
    np.testing.assert_allclose(out[0], alpha, rtol=1e-5)
    np.testing.assert_allclose(out[1], alpha * (1 - alpha), rtol=1e-5)
    ah = A.highpass_alpha(100.0)
    outh, _, _ = A.highpass(jnp.asarray(x), jnp.float32(0.0), jnp.float32(0.0), ah)
    np.testing.assert_allclose(np.asarray(outh)[0], ah, rtol=1e-5)


def test_echo_canceller_converges():
    """Synthetic echo: mic = speech + delayed/attenuated far-end. After
    adaptation the canceller removes most of the echo (>=10 dB ERLE) while
    passing near-end speech through."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n, ticks = 480, 40
    aec = A.EchoCanceller(taps=64, mu=0.7)
    # echo path: 8-sample delay, two taps
    echo_delay, g1, g2 = 8, 0.6, 0.2
    far_prev = np.zeros(64 + n, np.float32)
    residuals, echoes = [], []
    for t in range(ticks):
        far = rng.normal(0, 0.3, n).astype(np.float32)
        far_full = np.concatenate([far_prev[-64:], far])
        echo = g1 * far_full[64 - echo_delay : 64 - echo_delay + n] \
             + g2 * far_full[64 - echo_delay - 3 : 64 - echo_delay - 3 + n]
        mic = echo.astype(np.float32)  # far-end-only period (no near speech)
        out = np.asarray(aec.process(mic, far))
        residuals.append(float(np.mean(out[n // 2:] ** 2)))
        echoes.append(float(np.mean(echo[n // 2:] ** 2)))
        far_prev = far_full
    erle_db = 10 * np.log10(np.mean(echoes[-5:]) / (np.mean(residuals[-5:]) + 1e-12))
    assert erle_db > 10, f"ERLE only {erle_db:.1f} dB"

    # near-end speech during echo passes through mostly intact
    speech = (0.5 * np.sin(np.arange(n) / 9)).astype(np.float32)
    far = rng.normal(0, 0.3, n).astype(np.float32)
    far_full = np.concatenate([far_prev[-64:], far])
    echo = g1 * far_full[64 - echo_delay : 64 - echo_delay + n]
    out = np.asarray(aec.process(speech + echo.astype(np.float32), far))
    # correlation with the speech stays high; plain NLMS still adapts during
    # double-talk (AEC3 adds double-talk detection — documented future work),
    # so some distortion is expected
    corr = np.corrcoef(out, speech)[0, 1]
    assert corr > 0.75, corr


def test_audiodev_sources_and_sinks(tmp_path):
    """Capture sources + sinks (runtime/audiodev.py, src/client/audio.c
    device-glue analog): tone phase continuity, WAV resample/loop, file sink
    RMS accounting."""
    import wave

    import numpy as np

    from asciichat_tpu.runtime import audiodev as ad

    tone = ad.ToneSource(1000.0, 0.5)
    a, b = tone.read(480), tone.read(480)
    joined = np.concatenate([a, b])
    # phase-continuous across reads: matches one long synthesis
    t = np.arange(960) / ad.SAMPLE_RATE
    want = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    assert np.allclose(joined, want, atol=1e-5)

    # WAV: PCM16 stereo 24 kHz -> mono 48 kHz, looping
    path = str(tmp_path / "t.wav")
    sig = (np.sin(2 * np.pi * 440 * np.arange(2400) / 24000) * 16000).astype("<i2")
    stereo = np.repeat(sig, 2)
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(24000)
        w.writeframes(stereo.tobytes())
    src = ad.WavFileSource(path)
    buf = src.read(9600)  # 2x the (resampled) file length -> wraps
    assert buf.shape == (9600,) and np.abs(buf).max() > 0.3

    sink = ad.FileSink(str(tmp_path / "out.f32"))
    sink.write(a)
    sink.write(b)
    sink.close()
    back = np.fromfile(str(tmp_path / "out.f32"), "<f4")
    assert np.array_equal(back, joined)
    assert abs(sink.rms - np.sqrt((joined ** 2).mean())) < 1e-6

    silent = ad.SilenceSource()
    assert not silent.read(480).any()


def _echo_of(far: "np.ndarray", delay: int = 8, gain: float = 0.5):
    """Simulated acoustic echo path: delayed, attenuated two-tap kernel
    (total gain ~`gain`, i.e. >=6 dB echo return loss — the standard
    assumption behind the Geigel detector's 0.5 threshold)."""
    import numpy as np

    kernel = np.zeros(delay + 3, np.float32)
    kernel[delay] = gain * 0.8
    kernel[delay + 2] = gain * 0.2
    return np.convolve(far, kernel)[: len(far)].astype(np.float32)


def test_client_audio_pipeline_aec_converges():
    """ClientAudioPipeline (lib/audio/client_pipeline.cpp analog): a mic
    signal that is purely an echo of the far-end reference is attenuated
    >10 dB once NLMS converges; a live (non-echo) signal passes the gate."""
    import numpy as np

    from asciichat_tpu.ops.audio import ClientAudioPipeline

    rng = np.random.default_rng(0)
    far = rng.normal(0, 0.1, 48000).astype(np.float32)
    echo = _echo_of(far)
    p = ClientAudioPipeline()
    in_rms = out_rms = 0.0
    for i in range(0, 48000, 480):
        chunk = far[i : i + 480]
        p.add_far(chunk)
        out = p.process(echo[i : i + 480])  # mic == echo of the speaker
        if i >= 24000:  # after convergence
            in_rms += float(np.mean(echo[i : i + 480] ** 2))
            out_rms += float(np.mean(out ** 2))
    assert out_rms < in_rms / 10  # >10 dB ERLE

    p2 = ClientAudioPipeline(use_aec=False)
    tone = (0.2 * np.sin(2 * np.pi * 440 * np.arange(4800) / 48000)).astype(np.float32)
    outs = [p2.process(tone[i : i + 480]) for i in range(0, 4800, 480)]
    steady = np.concatenate(outs[5:])
    assert np.sqrt((steady ** 2).mean()) > 0.1  # gate open, tone passes


def test_aec_double_talk_safe():
    """AEC3-role double-talk handling (client_pipeline.cpp seat): during
    simultaneous near+far speech the Geigel detector freezes adaptation, so
    (a) the near-end talker passes with bounded distortion, and (b) the echo
    model does not diverge — the far-end-only segment AFTER double talk
    still achieves >=10 dB ERLE without re-converging from scratch."""
    import numpy as np

    from asciichat_tpu.ops.audio import EchoCanceller

    rng = np.random.default_rng(1)
    n_total = 48000 * 2
    far = rng.normal(0, 0.1, n_total).astype(np.float32)
    echo = _echo_of(far)
    t = np.arange(n_total, dtype=np.float32) / 48000.0
    near = (0.15 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    # phase 1: echo only (converge); phase 2: double talk; phase 3: echo only
    p1, p2 = 48000, 48000 + 24000
    mic = echo.copy()
    mic[p1:p2] += near[p1:p2]

    aec = EchoCanceller()
    out = np.empty_like(mic)
    dt_frac_phase2 = []
    for i in range(0, n_total, 480):
        out[i : i + 480] = np.asarray(aec.process(mic[i : i + 480],
                                                  far[i : i + 480]))
        if p1 <= i < p2:
            dt_frac_phase2.append(aec.double_talk_frac)

    # detector actually fired during double talk
    assert np.mean(dt_frac_phase2) > 0.5, np.mean(dt_frac_phase2)

    # (a) near-end preserved: residual vs the near signal during double talk
    # (skip the first 100 ms of the segment: hangover ramp-in)
    seg = slice(p1 + 4800, p2)
    err = out[seg] - near[seg]
    near_pow = float(np.mean(near[seg] ** 2))
    distortion = float(np.mean(err ** 2)) / near_pow
    assert distortion < 0.2, f"near-end distortion {10*np.log10(distortion):.1f} dB"

    # (b) no divergence: ERLE right after double talk ends (first 200 ms of
    # phase 3 — a diverged filter would need a full re-convergence)
    seg3 = slice(p2, p2 + 9600)
    erle = float(np.mean(echo[seg3] ** 2)) / max(float(np.mean(out[seg3] ** 2)), 1e-12)
    assert erle > 10.0, f"post-double-talk ERLE {10*np.log10(erle):.1f} dB"


def test_float32_wav_source(tmp_path):
    """IEEE-float WAVs (format 3 — stdlib wave rejects them) load via the
    direct RIFF parse; a corrupt file raises AudioSourceUnavailable."""
    import struct

    import numpy as np
    import pytest

    from asciichat_tpu.runtime import audiodev as ad

    sig = (0.25 * np.sin(2 * np.pi * 440 * np.arange(4800) / 48000)).astype("<f4")
    data = sig.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 4, 4, 32)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    path = tmp_path / "f32.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    src = ad.WavFileSource(str(path))
    out = src.read(4800)
    assert abs(float(np.sqrt((out ** 2).mean())) - 0.1767) < 0.01

    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"garbage-not-a-wav")
    with pytest.raises(ad.AudioSourceUnavailable):
        ad.WavFileSource(str(bad))
