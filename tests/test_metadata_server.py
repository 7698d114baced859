"""HTTP metadata-server dataset mode (clip_dataset.py:92-104,157-178) against
a local stdlib server."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from declip_tpu.data.dataset import ClipDataset

METAS = [
    {"filename": f"img_{i}.jpg", "caption": f"caption {i}", "label": i % 2,
     "source_id": 0}
    for i in range(6)
]


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/get_len":
            body = json.dumps(len(METAS))
        elif self.path.startswith("/get/"):
            body = json.dumps(METAS[int(self.path.split("/")[-1])])
        else:
            self.send_response(404)
            self.end_headers()
            return
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


@pytest.fixture
def server():
    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def test_metadata_server_mode(server):
    host, port = server
    ds = ClipDataset(
        root_dir=["/data/shard0"], meta_file=[None],
        server_cfg={"ip": host, "port": port},
    )
    assert len(ds) == 6
    meta = ds._meta(3)
    assert meta["caption"] == "caption 3"
    assert meta["filename"] == "/data/shard0/img_3.jpg"
    # label mapping flows through the server path too
    assert ds._meta(0)["label"] == 0
