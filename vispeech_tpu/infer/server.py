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


GUI_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>vispeech-tpu prosody editor</title>
<style>
body{font-family:sans-serif;max-width:920px;margin:24px auto;padding:0 12px}
textarea{width:100%;height:60px}
#phones{display:flex;gap:6px;overflow-x:auto;padding:12px 0}
.ph{display:flex;flex-direction:column;align-items:center;font-size:12px}
.ph input[type=range]{writing-mode:vertical-lr;direction:rtl;height:120px}
.ph .dur{width:42px}
button{padding:6px 16px;margin-right:8px}
#status{color:#666;margin-left:8px}
</style></head><body>
<h3>vispeech-tpu — per-phoneme prosody editor</h3>
<textarea id="text">[P]ni2 hao3 shi4 jie4[P]</textarea>
<div style="margin:8px 0">
 speaker <input id="spk" value="0" size="6">
 noise <input id="noise" value="0.667" size="5">
 <button onclick="synth()">Synthesize</button>
 <button onclick="resynth()" id="re" disabled>Re-synthesize with edits</button>
 <span id="status"></span>
</div>
<div id="phones"></div>
<audio id="player" controls style="width:100%"></audio>
<script>
let state = null;
const S=id=>document.getElementById(id);
function spk(){const v=S('spk').value;return /^\\d+$/.test(v)?parseInt(v):v}
async function synth(){
  S('status').textContent='predicting…';
  const u=`/tts.json?text=${encodeURIComponent(S('text').value)}`+
          `&speaker=${encodeURIComponent(S('spk').value)}&noise=${S('noise').value}`;
  const r=await fetch(u); const j=await r.json();
  if(j.error){S('status').textContent=j.error;return}
  state=j; render(); await resynth();
}
function render(){
  const div=S('phones'); div.innerHTML='';
  state.phones.forEach((p,i)=>{
    const f0=state.f0[i], d=state.duration[i];
    div.insertAdjacentHTML('beforeend',
     `<div class="ph"><b>${p}</b>
      <input type="range" min="50" max="600" step="1" value="${Math.min(600,Math.max(50,f0))}"
             oninput="state.f0[${i}]=+this.value;this.nextElementSibling.textContent=this.value+'Hz'">
      <span>${Math.round(f0)}Hz</span>
      <input class="dur" type="number" min="0" step="1" value="${Math.round(d)}"
             oninput="state.duration[${i}]=+this.value"></div>`);
  });
  S('re').disabled=false;
}
async function resynth(){
  S('status').textContent='synthesizing…';
  const body={phones:state.phones,speaker:spk(),noise:+S('noise').value,
              pitch:state.f0,duration:state.duration,energy:state.energy};
  const r=await fetch('/tts',{method:'POST',headers:{'Content-Type':'application/json'},
                              body:JSON.stringify(body)});
  if(!r.ok){S('status').textContent=(await r.json()).error;return}
  const blob=await r.blob();
  S('player').src=URL.createObjectURL(blob); S('player').play();
  S('status').textContent='done';
}
</script></body></html>
"""


def wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    """Encode waveform as 16-bit PCM WAV in memory.

    int16 input (the engine's on-device-quantized 'audio_int16') passes
    through untouched; float input is quantized here."""
    audio = np.asarray(audio)
    if audio.dtype == np.int16:
        pcm = audio.astype("<i2", copy=False)
    else:
        # np.round matches the device quantizer (pipeline._get_infer_fn) so
        # CPU serving and TPU int16 passthrough emit identical PCM
        pcm = np.round(
            np.clip(audio.astype(np.float32), -1, 1) * 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def make_handler(engine, lock: threading.Lock, coalescer=None):
    """``coalescer`` (infer/coalescer.RequestCoalescer): when given, TTS
    requests are queued and coalesced into device batches instead of being
    refused with 503 while another request runs — the capability upgrade
    over the reference's serial mutex (reference inference_api.py:35-40).
    Voice conversion keeps the mutex (spec-length-dependent shapes batch
    poorly)."""

    class Handler(BaseHTTPRequestHandler):
        def _synthesize(self, phones, kwargs):
            """(out, error_response): coalesced when enabled, else mutex."""
            if coalescer is not None:
                from vispeech_tpu.infer.coalescer import ServerBusy

                try:
                    return coalescer.submit(phones, **kwargs), None
                except ServerBusy as e:
                    return None, (503, {"error": str(e)})
                except TimeoutError as e:
                    return None, (503, {"error": str(e)})
                except Exception as e:  # noqa: BLE001
                    return None, (500, {"error": str(e)})
            if not lock.acquire(blocking=False):
                return None, (503, {"error": "server busy"})
            try:
                return engine.synthesize(phones=phones, **kwargs), None
            except Exception as e:  # noqa: BLE001
                return None, (500, {"error": str(e)})
            finally:
                lock.release()

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._send(code, json.dumps(obj, ensure_ascii=False).encode(),
                       "application/json")

        def _do_vc(self, url):
            """POST /vc?src=<spk>&tgt=<spk> with a WAV body → converted WAV
            (flow-based any-to-any conversion, reference models.py:724-732)."""
            import io

            from scipy.io import wavfile

            q = {k: v[0] for k, v in urllib.parse.parse_qs(url.query).items()}
            try:
                length = int(self.headers.get("Content-Length", 0))
                sr, data = wavfile.read(io.BytesIO(self.rfile.read(length)))
            except Exception as e:  # noqa: BLE001
                return self._json(400, {"error": f"bad WAV body: {e}"})
            if sr != engine.cfg.data.sampling_rate:
                return self._json(400, {
                    "error": f"sample rate {sr} != {engine.cfg.data.sampling_rate}"
                })
            if data.dtype.kind == "i":
                wav = data.astype(np.float32) / float(np.iinfo(data.dtype).max)
            else:
                wav = data.astype(np.float32)
            if wav.ndim > 1:
                wav = wav[:, 0]

            def spk(name, default):
                v = q.get(name, default)
                return int(v) if v.isdigit() else v

            if not lock.acquire(blocking=False):
                return self._json(503, {"error": "server busy"})
            try:
                out = engine.voice_conversion(
                    wav, speaker_src=spk("src", "0"), speaker_tgt=spk("tgt", "0")
                )
            except Exception as e:  # noqa: BLE001
                return self._json(500, {"error": str(e)})
            finally:
                lock.release()
            return self._send(
                200, wav_bytes(out["audio"], out["sampling_rate"]), "audio/wav"
            )

        def do_POST(self):  # noqa: N802
            """POST /tts with a JSON body — the prosody-editing contract
            (gui.py:82-113): per-phoneme `pitch` (Hz), `duration` (frames)
            and `energy` arrays override the predictors."""
            url = urllib.parse.urlparse(self.path)
            if url.path == "/vc":
                return self._do_vc(url)
            if url.path != "/tts":
                return self._json(404, {"error": "not found"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": f"bad JSON: {e}"})
            text = body.get("text")
            phones = body.get("phones")
            if not text and not phones:
                return self._json(400, {"error": "missing text or phones"})

            def ctrl(name):
                v = body.get(name)
                if v is None:
                    return None
                if isinstance(v, (int, float)):
                    return float(v)
                return np.asarray(v, np.float32)

            try:
                kwargs = dict(
                    speaker=body.get("speaker", 0),
                    noise_scale=float(body.get("noise", 0.667)),
                    duration_control=ctrl("duration"),
                    pitch_control=ctrl("pitch"),
                    energy_control=ctrl("energy"),
                    seed=int(body.get("seed", 0)),
                )
                sr_out = int(body["sr"]) if "sr" in body else None
                if sr_out is not None and sr_out <= 0:
                    raise ValueError(f"sr={sr_out}")
            except (TypeError, ValueError) as e:
                return self._json(400, {"error": f"bad parameter: {e}"})
            if not phones:
                # frontend failures (unsupported language without its
                # optional dep, no valid phones) are client errors: 400
                try:
                    phones = engine.phonemes(text)
                    if not phones:
                        raise ValueError("text produced no phonemes")
                except Exception as e:  # noqa: BLE001
                    return self._json(400, {"error": f"text frontend: {e}"})
            out, err = self._synthesize(phones, kwargs)
            if err is not None:
                return self._json(*err)
            audio, sr = out["audio"], out["sampling_rate"]
            if sr_out is not None and sr_out != sr:
                from vispeech_tpu.dsp.resample import resample

                audio, sr = resample(audio, sr, sr_out), sr_out
            elif "audio_int16" in out:  # device-quantized PCM: skip requant
                audio = out["audio_int16"]
            return self._send(200, wav_bytes(audio, sr), "audio/wav")

        def do_GET(self):  # noqa: N802
            url = urllib.parse.urlparse(self.path)
            q = {k: v[0] for k, v in urllib.parse.parse_qs(url.query).items()}
            if url.path == "/health":
                return self._json(200, {"ok": True})
            if url.path in ("/", "/index.html"):
                return self._send(200, GUI_HTML.encode(), "text/html; charset=utf-8")
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
                sr_out = int(q["sr"]) if "sr" in q else None
                if sr_out is not None and sr_out <= 0:
                    raise ValueError(f"sr={sr_out}")
            except ValueError as e:
                return self._json(400, {"error": f"bad parameter: {e}"})
            try:
                phones = engine.phonemes(text)
                if not phones:
                    raise ValueError("text produced no phonemes")
            except Exception as e:  # noqa: BLE001
                return self._json(400, {"error": f"text frontend: {e}"})
            out, err = self._synthesize(phones, kwargs)
            if err is not None:
                return self._json(*err)
            if url.path == "/tts.json":
                return self._json(200, {
                    "sampling_rate": out["sampling_rate"],
                    "phones": out["phones"],
                    "duration": [float(x) for x in out["duration"]],
                    "f0": [float(x) for x in out["f0"]],
                    "energy": [float(x) for x in out["energy"]],
                    "n_samples": int(len(out["audio"])),
                })
            # output-rate conversion (reference resamples 44.1k->22.05k per
            # request via ffmpeg, inference_api.py:66-67 — here in-process)
            audio, sr = out["audio"], out["sampling_rate"]
            if sr_out is not None and sr_out != sr:
                from vispeech_tpu.dsp.resample import resample

                audio, sr = resample(audio, sr, sr_out), sr_out
            elif "audio_int16" in out:  # device-quantized PCM: skip requant
                audio = out["audio_int16"]
            return self._send(200, wav_bytes(audio, sr), "audio/wav")

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(engine, host: str = "0.0.0.0", port: int = 7860,
          batch_window_ms: float = 20.0, max_batch: int = 16):
    """``batch_window_ms > 0`` (default): coalesce concurrent TTS requests
    into device batches (infer/coalescer.py); 0 = legacy serial mutex with
    503 on contention (the reference's behavior)."""
    lock = threading.Lock()
    coalescer = None
    if batch_window_ms > 0:
        from vispeech_tpu.infer.coalescer import RequestCoalescer

        coalescer = RequestCoalescer(
            engine, window_ms=batch_window_ms, max_batch=max_batch)
    httpd = ThreadingHTTPServer(
        (host, port), make_handler(engine, lock, coalescer=coalescer))
    mode = (f"coalescing (window {batch_window_ms} ms, max_batch {max_batch})"
            if coalescer else "serial mutex")
    print(f"serving on http://{host}:{port}/tts?text=... [{mode}]")
    httpd.serve_forever()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-k", "--ckpt-dir", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--batch-window-ms", type=float, default=20.0,
                   help="request-coalescing window; 0 = serial mutex mode")
    p.add_argument("--max-batch", type=int, default=16)
    from vispeech_tpu.utils.platform import add_platform_arg, apply_platform

    add_platform_arg(p)
    args = p.parse_args()
    apply_platform(args.platform)

    from vispeech_tpu.infer.pipeline import TTSEngine

    engine = TTSEngine.from_checkpoint(args.config, args.ckpt_dir)
    serve(engine, args.host, args.port,
          batch_window_ms=args.batch_window_ms, max_batch=args.max_batch)


if __name__ == "__main__":
    main()
