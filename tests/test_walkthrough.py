"""End-to-end walkthrough script (examples/walkthrough.py) — the committed
equivalent of the reference's inference.ipynb (train → TTS → speaker
selection → per-phoneme pitch edit → voice conversion), exercised as one
subprocess so the user journey stays runnable."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # trains 2 GAN steps (multi-minute CPU compile)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_walkthrough_end_to_end(tmp_path):
    out_dir = tmp_path / "out"
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "walkthrough.py"),
         "--out-dir", str(out_dir), "--steps", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads((out_dir / "summary.json").read_text())
    assert summary["artifacts"] == [
        "tts_alice.wav", "tts_alice_pitch+4st.wav", "tts_bob.wav",
        "vc_alice_to_bob.wav",
    ]
    # every artifact is a non-trivial RIFF wav
    for name in summary["artifacts"]:
        data = (out_dir / name).read_bytes()
        assert data[:4] == b"RIFF" and len(data) > 100, name
    # the prosody-edit loop really shifted F0 by +4 semitones (a barely
    # trained model can predict NEGATIVE F0 — compare products, not ratios)
    import numpy as np

    pred = np.asarray(summary["f0_pred_hz"])
    edited = np.asarray(summary["f0_edited_hz"])
    np.testing.assert_allclose(
        edited, pred * 2.0 ** (4.0 / 12.0), rtol=1e-3, atol=1e-2)
