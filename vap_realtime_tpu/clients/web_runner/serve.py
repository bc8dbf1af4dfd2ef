"""Serve the web runner (fetch() requires http, not file://).

Run: python vap_realtime_tpu/clients/web_runner/serve.py [port]
then open http://localhost:8619/
"""

import http.server
import os
import sys

os.chdir(os.path.dirname(os.path.abspath(__file__)))
port = int(sys.argv[1]) if len(sys.argv) > 1 else 8619
http.server.ThreadingHTTPServer(
    ("127.0.0.1", port),
    http.server.SimpleHTTPRequestHandler).serve_forever()
