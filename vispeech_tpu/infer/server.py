"""HTTP TTS server (reference inference_api.py:35-69, Flask → stdlib).

    python -m vispeech_tpu.infer.server -c configs/config.json -k logdir/run

Endpoints:
  GET /tts?text=...&speaker=0&noise=0.667&duration=1.0&pitch=1.0&energy=1.0
      → audio/wav (16-bit PCM at the model rate)
  GET /tts.json?text=...   → JSON with per-phoneme prosody (the GUI editing
      contract: phones, duration, f0, energy — gui.py:82-113)
  GET /health              → {"ok": true}

A mutex serializes synthesis; concurrent requests get 503 ("server busy",
matching inference_api.py:37-40's non-blocking lock).
"""

from __future__ import annotations

import argparse
import io
import json
import struct
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    """Encode float waveform as 16-bit PCM WAV in memory."""
    pcm = (np.clip(np.asarray(audio, np.float32), -1, 1) * 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def make_handler(engine, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._send(code, json.dumps(obj, ensure_ascii=False).encode(),
                       "application/json")

        def do_GET(self):  # noqa: N802
            url = urllib.parse.urlparse(self.path)
            q = {k: v[0] for k, v in urllib.parse.parse_qs(url.query).items()}
            if url.path == "/health":
                return self._json(200, {"ok": True})
            if url.path not in ("/tts", "/tts.json"):
                return self._json(404, {"error": "not found"})
            text = q.get("text", "")
            if not text:
                return self._json(400, {"error": "missing text"})
            try:
                spk = q.get("speaker", "0")
                kwargs = dict(
                    speaker=int(spk) if spk.isdigit() else spk,
                    noise_scale=float(q.get("noise", 0.667)),
                    duration_control=float(q["duration"]) if "duration" in q else None,
                    pitch_control=float(q["pitch"]) if "pitch" in q else None,
                    energy_control=float(q["energy"]) if "energy" in q else None,
                    seed=int(q.get("seed", 0)),
                )
            except ValueError as e:
                return self._json(400, {"error": f"bad parameter: {e}"})
            if not lock.acquire(blocking=False):
                return self._json(503, {"error": "server busy"})
            try:
                out = engine.synthesize(text=text, **kwargs)
            except Exception as e:  # noqa: BLE001
                return self._json(500, {"error": str(e)})
            finally:
                lock.release()
            if url.path == "/tts.json":
                return self._json(200, {
                    "sampling_rate": out["sampling_rate"],
                    "phones": out["phones"],
                    "duration": [float(x) for x in out["duration"]],
                    "f0": [float(x) for x in out["f0"]],
                    "energy": [float(x) for x in out["energy"]],
                    "n_samples": int(len(out["audio"])),
                })
            body = wav_bytes(out["audio"], out["sampling_rate"])
            return self._send(200, body, "audio/wav")

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(engine, host: str = "0.0.0.0", port: int = 7860):
    lock = threading.Lock()
    httpd = ThreadingHTTPServer((host, port), make_handler(engine, lock))
    print(f"serving on http://{host}:{port}/tts?text=...")
    httpd.serve_forever()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-k", "--ckpt-dir", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()

    from vispeech_tpu.infer.pipeline import TTSEngine

    engine = TTSEngine.from_checkpoint(args.config, args.ckpt_dir)
    serve(engine, args.host, args.port)


if __name__ == "__main__":
    main()
