"""Live web waterfall — a tiny HTTP view of a running session.

Headless counterpart of the reference's MainSpectrum window (reference
Components/MainSpectrum.cpp waterfall feed 196-210): one thread, the
stdlib HTTP server, three endpoints —

  GET /               a self-refreshing page (waterfall + peak info)
  GET /waterfall.png  the current waterfall raster
  GET /psd.json       latest PSD row + metadata (freq/rate/timestamps)

The session feeds :meth:`feed` with every PSDMessage; rendering cost
is paid per HTTP request, not per message.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = b"""<!doctype html>
<html><head><title>sigdigger_tpu live spectrum</title>
<style>body{background:#111;color:#ddd;font-family:monospace}
img{width:100%;image-rendering:pixelated;border:1px solid #444}
</style></head><body>
<h3>sigdigger_tpu live spectrum</h3>
<div id=i>&nbsp;</div>
<img id=w src="/waterfall.png">
<script>
async function tick(){
 try{
  const r=await fetch('/psd.json');const j=await r.json();
  document.getElementById('i').textContent=
   `center ${(j.frequency/1e6).toFixed(4)} MHz  rate ${(j.sample_rate/1e6).toFixed(3)} Msps  `+
   `peak ${(j.peak_freq/1e6).toFixed(4)} MHz ${j.peak_db.toFixed(1)} dB  rows ${j.rows}`;
  document.getElementById('w').src='/waterfall.png?t='+Date.now();
 }catch(e){}
 setTimeout(tick,1000);
}
tick();
</script></body></html>"""


class WebSpectrumServer:
    """Serve the live waterfall + PSD over HTTP."""

    def __init__(self, waterfall, host: str = "127.0.0.1",
                 port: int = 0) -> None:
        self._wf = waterfall
        self._lock = threading.Lock()
        self._psd: np.ndarray | None = None
        self._meta: dict = {}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):          # quiet
                pass

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/":
                    self._send(200, "text/html", _PAGE)
                elif path == "/waterfall.png":
                    with outer._lock:
                        png = outer._wf.png_bytes()
                    self._send(200, "image/png", png)
                elif path == "/psd.json":
                    self._send(200, "application/json",
                               outer._psd_json())
                else:
                    self._send(404, "text/plain", b"not found")

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self.address = self._srv.server_address
        threading.Thread(target=self._srv.serve_forever,
                         daemon=True, name="web-spectrum").start()

    def feed(self, msg) -> None:
        """Consume one PSDMessage (the session's pump calls this)."""
        data = np.asarray(msg.data, np.float32)
        with self._lock:
            self._psd = data
            self._meta = {
                "frequency": float(msg.frequency),
                "sample_rate": float(msg.sample_rate),
                "measured_sample_rate": float(
                    msg.measured_sample_rate),
                "timestamp": float(msg.timestamp),
                "fft_size": int(msg.fft_size),
            }

    def _psd_json(self) -> bytes:
        with self._lock:
            psd = self._psd
            meta = dict(self._meta)
        if psd is None:
            return json.dumps({"rows": 0}).encode()
        db = 10.0 * np.log10(np.asarray(psd, np.float64) + 1e-30)
        k = int(np.argmax(db))
        fs = meta.get("sample_rate", 0.0)
        n = len(db)
        meta.update({
            "rows": int(self._wf.rows),
            "peak_db": float(db[k]),
            "peak_freq": meta.get("frequency", 0.0)
            + (k - n // 2) * fs / n,
            "psd_db": [round(float(v), 2) for v in db],
        })
        return json.dumps(meta).encode()

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
