"""Web frontend: upload -> rotate -> artifacts over real HTTP."""

import pathlib
import threading
import urllib.request
import uuid

import pytest

from csa_tpu.web import app as webapp

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    webapp.UPLOAD_DIR = str(tmp_path_factory.mktemp("uploads"))
    webapp.LOG_FILE = webapp.UPLOAD_DIR + "/requests.log"
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), webapp.Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_upload_and_results(server):
    boundary = uuid.uuid4().hex
    fasta = (FIXTURES / "tiny" / "t1.txt").read_bytes()
    body = (
        f'--{boundary}\r\nContent-Disposition: form-data; '
        f'name="fastafile"; filename="t1.txt"\r\n'
        f"Content-Type: text/plain\r\n\r\n"
    ).encode() + fasta + (
        f"\r\n--{boundary}--\r\n"
    ).encode()
    req = urllib.request.Request(
        server + "/run",
        data=body,
        headers={
            "Content-Type": f"multipart/form-data; boundary={boundary}"
        },
    )
    text = urllib.request.urlopen(req, timeout=120).read().decode()
    assert "Results" in text
    assert "Download Rotated FASTA" in text
    # the block map is actually clickable: a real <map> with <area> tags
    # built from the imagemap data (reference index.php:383-405), whose
    # hrefs land on positions-table row anchors
    assert '<map name="blocksmap"' in text
    assert "<area " in text
    import re as _re

    hrefs = set(_re.findall(r'href="#(row\d+)"', text))
    ids = set(_re.findall(r'<tr id="(row\d+)"', text))
    assert hrefs and hrefs <= ids
    # the rotated-FASTA artifact downloads and carries the @ rotations
    import re

    m = re.search(r"/file\?t=([^&\"]+)&k=rotated", text)
    assert m
    rot = urllib.request.urlopen(
        server + f"/file?t={m.group(1)}&k=rotated", timeout=30
    ).read().decode()
    assert "@ 74" in rot  # s0's captured reference rotation


def test_form_page(server):
    page = urllib.request.urlopen(server + "/", timeout=30).read().decode()
    assert "fastafile" in page and "minblocksize" in page


def test_rejects_empty(server):
    req = urllib.request.Request(
        server + "/run", data=b"", headers={"Content-Type": "text/plain"}
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised
