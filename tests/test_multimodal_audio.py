"""Real WAV/PCM audio decode (stdlib wave) — encode/decode round-trip and
the actor-pool feature stage vs a directly-computed oracle."""

import numpy as np
import pytest

from engine.ops.multimodal import AudioFeatureStage, wav_decode, wav_encode


def test_wav_roundtrip_pcm16():
    rng = np.random.default_rng(3)
    sig = np.clip(rng.standard_normal(4000) * 0.3, -1, 1)
    payload = wav_encode(sig, 8000)
    got, sr = wav_decode(payload)
    assert sr == 8000 and got.size == 4000
    # PCM16 round-half error + 32767/32768 scale mismatch
    np.testing.assert_allclose(got, sig, atol=5e-5)


def test_wav_decode_8bit_and_stereo():
    import io
    import wave

    # 8-bit mono
    raw8 = (np.array([0, 64, 128, 192, 255], dtype=np.uint8)).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(raw8)
    sig, sr = wav_decode(buf.getvalue())
    np.testing.assert_allclose(sig, (np.array([0, 64, 128, 192, 255]) - 128) / 128.0)
    # 16-bit stereo -> mono mean
    st = np.array([[1000, 3000], [-2000, 2000]], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(st.tobytes())
    sig, sr = wav_decode(buf.getvalue())
    np.testing.assert_allclose(sig, st.mean(axis=1) / 32768.0)


def test_audio_feature_stage_matches_oracle(ray_session):
    from engine.fixtures.gen import audio_dataset, gen_audio_row
    from engine.ops.multimodal import decode_stage

    n = 50
    out = (decode_stage(audio_dataset(n, parallelism=2), AudioFeatureStage,
                        id_col="audio_id")
           .to_pandas().set_index("id").sort_index())
    assert len(out) == n
    for i in [0, 7, 23, 49]:
        row = gen_audio_row(i)
        sig, sr = wav_decode(row["bytes"])
        assert out.loc[row["audio_id"], "n_samples"] == row["n_samples"] == sig.size
        rms = float(np.sqrt((sig ** 2).mean()))
        spec = np.abs(np.fft.rfft(sig))
        freqs = np.fft.rfftfreq(sig.size, 1.0 / sr)
        cent = float((spec * freqs).sum() / spec.sum())
        np.testing.assert_allclose(out.loc[row["audio_id"], "rms"], rms, rtol=1e-12)
        np.testing.assert_allclose(out.loc[row["audio_id"], "spectral_centroid"], cent, rtol=1e-9)


def test_non_wav_payload_raises():
    stage = AudioFeatureStage(id_col="id")
    import pyarrow as pa

    t = pa.table({"id": ["x"], "bytes": [b"not a wav"]})
    with pytest.raises(Exception):
        stage(t)


def test_zero_frame_wav_yields_zero_features():
    """ADVICE r2: a valid zero-frame WAV must not crash the FFT."""
    import io
    import wave

    from engine.ops.multimodal import AudioFeatureStage

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"")
    n, rms, cent = AudioFeatureStage()._features(buf.getvalue())
    assert (n, rms, cent) == (0, 0.0, 0.0)
