"""NTLM (MS-NLMP) implementation pinned to OFFICIAL test vectors:
RFC 1320's MD4 suite and the [MS-NLMP] 4.2.4 NTLMv2 vectors (NTOWFv2,
NTProofStr, SessionBaseKey for User/Password/Domain with the spec's
fixed challenges) — plus a full 401 handshake against an in-process
stdlib HTTP server that VERIFIES the client's NTProofStr server-side."""

import base64
import hmac
import struct
import threading

import pytest

from vectordb_data_ingestion_spark.sources.ntlm import (
    authenticate_message,
    md4,
    negotiate_message,
    ntlmv2_response,
    ntowf_v2,
    parse_challenge,
)

SERVER_CHALLENGE = bytes.fromhex("0123456789abcdef")
CLIENT_CHALLENGE = b"\xaa" * 8
TARGET_INFO = bytes.fromhex(
    "02000c0044006f006d00610069006e00"
    "01000c00530065007200760065007200"
    "00000000"
)


def test_md4_rfc1320_vectors():
    vectors = {
        b"": "31d6cfe0d16ae931b73c59d7e0c089c0",
        b"a": "bde52cb31de33e46245e05fbdbd6fb24",
        b"abc": "a448017aaf21d8525fc10ae87aa6729d",
        b"message digest": "d9130a8164549fe818874806e1c7014b",
        b"abcdefghijklmnopqrstuvwxyz": "d79e1c308aa5bbcdeea8ed63df412da9",
        b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789":
            "043f8582f241db351ce627e153e7f0e4",
    }
    for msg, want in vectors.items():
        assert md4(msg).hex() == want, msg


def test_msnlmp_424_ntlmv2_vectors():
    ntowf = ntowf_v2("User", "Password", "Domain")
    assert ntowf.hex() == "0c868a403bfd7a93a3001ef22ef02e3f"
    proof, response, sbk = ntlmv2_response(
        ntowf, SERVER_CHALLENGE, CLIENT_CHALLENGE, 0, TARGET_INFO
    )
    assert proof.hex() == "68cd0ab851e51c96aabc927bebef6a1c"
    assert sbk.hex() == "8de40ccadbc14a82f15cb0ad0de95ca3"
    assert response[:16] == proof  # NtChallengeResponse = proof + temp


def test_message_framing_roundtrip():
    neg = negotiate_message()
    assert neg[:8] == b"NTLMSSP\x00" and neg[8:12] == b"\x01\x00\x00\x00"
    # build a CHALLENGE like a server would and parse it back
    ti = TARGET_INFO
    challenge = (
        b"NTLMSSP\x00" + struct.pack("<I", 2)
        + struct.pack("<HHI", 0, 0, 48)       # target name
        + struct.pack("<I", 0x00000001)       # flags
        + SERVER_CHALLENGE + b"\x00" * 8      # challenge + reserved
        + struct.pack("<HHI", len(ti), len(ti), 48)
        + ti
    )
    sc, parsed_ti = parse_challenge(challenge)
    assert sc == SERVER_CHALLENGE and parsed_ti == ti
    with pytest.raises(ValueError):
        parse_challenge(b"HTTP basic nonsense")
    auth = authenticate_message(
        "User", "Password", "Domain", SERVER_CHALLENGE, ti,
        client_challenge=CLIENT_CHALLENGE, timestamp=0,
    )
    assert auth[:8] == b"NTLMSSP\x00" and auth[8:12] == b"\x03\x00\x00\x00"
    # the embedded NtChallengeResponse must carry the spec vector proof
    nt_len, _mx, nt_off = struct.unpack("<HHI", auth[20:28])
    assert auth[nt_off: nt_off + 16].hex() == (
        "68cd0ab851e51c96aabc927bebef6a1c"
    )


def test_http_handshake_against_verifying_server():
    """End to end over real HTTP: an in-process server demands NTLM,
    issues the challenge, and VERIFIES the type-3 NTProofStr with its
    own HMAC over the client's blob — wrong passwords are rejected."""
    requests = pytest.importorskip("requests")
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vectordb_data_ingestion_spark.sources.ntlm import http_ntlm_auth

    expected_ntowf = ntowf_v2("User", "Password", "Domain")

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            auth = self.headers.get("Authorization", "")
            if not auth.startswith("NTLM "):
                self.send_response(401)
                self.send_header("WWW-Authenticate", "NTLM")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            msg = base64.b64decode(auth[5:])
            mtype = struct.unpack("<I", msg[8:12])[0]
            if mtype == 1:
                ti = TARGET_INFO
                challenge = (
                    b"NTLMSSP\x00" + struct.pack("<I", 2)
                    + struct.pack("<HHI", 0, 0, 48)
                    + struct.pack("<I", 1)
                    + SERVER_CHALLENGE + b"\x00" * 8
                    + struct.pack("<HHI", len(ti), len(ti), 48)
                    + ti
                )
                self.send_response(401)
                self.send_header(
                    "WWW-Authenticate",
                    "NTLM " + base64.b64encode(challenge).decode(),
                )
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            # type 3: server-side verification of the NTLMv2 proof
            nt_len, _m, nt_off = struct.unpack("<HHI", msg[20:28])
            nt_resp = msg[nt_off: nt_off + nt_len]
            proof, temp = nt_resp[:16], nt_resp[16:]
            expect = hmac.new(
                expected_ntowf, SERVER_CHALLENGE + temp, "md5"
            ).digest()
            ok = hmac.compare_digest(proof, expect)
            body = b"granted" if ok else b"denied"
            self.send_response(200 if ok else 401)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_port}/api"
        good = requests.get(
            url, auth=http_ntlm_auth("Domain\\User", "Password"), timeout=10
        )
        assert good.status_code == 200 and good.content == b"granted"
        bad = requests.get(
            url, auth=http_ntlm_auth("Domain\\User", "wrong"), timeout=10
        )
        assert bad.status_code == 401
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_onprem_lister_end_to_end_with_stdlib_ntlm(spark):
    """The reference's whole on-prem path with ZERO extra packages: the
    default fetch_json builds a requests session with the stdlib NTLMv2
    auth, passes the verifying server's handshake, fetches the OData
    folder JSON, and the catalog DataFrame comes out with the reference's
    derived columns."""
    import json

    requests = pytest.importorskip("requests")  # noqa: F841
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vectordb_data_ingestion_spark.sources.sharepoint import (
        catalog_from_lister,
        onprem_sharepoint_lister,
    )

    expected_ntowf = ntowf_v2("svc", "S3cret", "CORP")
    odata = {
        "d": {
            "results": [
                {
                    "Name": "a.docx",
                    "ServerRelativeUrl": "/kb/a.docx",
                    "TimeLastModified": "2026-01-02T03:04:05Z",
                },
                {
                    "Name": "b.pdf",
                    "ServerRelativeUrl": "/kb/b.pdf",
                    "TimeLastModified": "2026-01-03T04:05:06Z",
                },
            ]
        }
    }

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            auth = self.headers.get("Authorization", "")
            if not auth.startswith("NTLM "):
                self.send_response(401)
                self.send_header("WWW-Authenticate", "NTLM")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            msg = base64.b64decode(auth[5:])
            if struct.unpack("<I", msg[8:12])[0] == 1:
                ti = TARGET_INFO
                challenge = (
                    b"NTLMSSP\x00" + struct.pack("<I", 2)
                    + struct.pack("<HHI", 0, 0, 48)
                    + struct.pack("<I", 1)
                    + SERVER_CHALLENGE + b"\x00" * 8
                    + struct.pack("<HHI", len(ti), len(ti), 48)
                    + ti
                )
                self.send_response(401)
                self.send_header(
                    "WWW-Authenticate",
                    "NTLM " + base64.b64encode(challenge).decode(),
                )
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            nt_len, _m, nt_off = struct.unpack("<HHI", msg[20:28])
            nt_resp = msg[nt_off: nt_off + nt_len]
            expect = hmac.new(
                expected_ntowf, SERVER_CHALLENGE + nt_resp[16:], "md5"
            ).digest()
            if not hmac.compare_digest(nt_resp[:16], expect):
                self.send_response(401)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = json.dumps(odata).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_port}/_api/folder"
        lister = onprem_sharepoint_lister(
            [url], username="svc", password="S3cret", domain="CORP"
        )
        cat = catalog_from_lister(spark, lister)
        rows = {r["name"]: r for r in cat.collect()}
        assert set(rows) == {"a.docx", "b.pdf"}
        assert rows["a.docx"]["file_type"] == "docx"
        assert rows["a.docx"]["url"] == "/kb/a.docx"
        assert rows["b.pdf"]["modified_dt"] is not None
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_multi_scheme_header_parsing():
    """Stock IIS advertises 'Negotiate, NTLM' (requests joins multiple
    WWW-Authenticate headers with ', '); the auth hook must still pick
    NTLM out, and must decode only the NTLM token's blob when other
    schemes trail the challenge (review r4)."""
    pytest.importorskip("requests")
    from vectordb_data_ingestion_spark.sources.ntlm import http_ntlm_auth

    auth = http_ntlm_auth("Domain\\User", "Password")
    tok = auth._ntlm_token
    assert tok("Negotiate, NTLM") == ""
    assert tok("NTLM") == ""
    assert tok("Negotiate") is None
    assert tok("Basic realm=x") is None
    blob = base64.b64encode(b"NTLMSSP\x00\x02").decode()
    assert tok(f"NTLM {blob}, Negotiate") == blob
    assert tok(f"Negotiate, NTLM {blob}") == blob


def test_parse_challenge_truncation_never_struct_error():
    """The CHALLENGE is untrusted network bytes: every truncation of a
    valid message (and plain garbage) must raise ValueError — one clean
    exception type — never struct.error from a short unpack slice."""
    ti = TARGET_INFO
    valid = (
        b"NTLMSSP\x00" + struct.pack("<I", 2)
        + struct.pack("<HHI", 0, 0, 48)
        + struct.pack("<I", 0x00000001)
        + SERVER_CHALLENGE + b"\x00" * 8
        + struct.pack("<HHI", len(ti), len(ti), 48)
        + ti
    )
    for i in range(48):
        with pytest.raises(ValueError):
            parse_challenge(valid[:i])
    for junk in (b"", b"\x00" * 47, b"NTLMSSP\x00" + b"\xff" * 64):
        with pytest.raises(ValueError):
            parse_challenge(junk)


def test_garbled_server_challenge_is_auth_failure_not_crash():
    """A server answering the NEGOTIATE with a garbled challenge token
    (bad base64, or valid base64 of a non-CHALLENGE) must surface as a
    401 to the caller — an auth failure — not an exception mid-request."""
    requests = pytest.importorskip("requests")
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from vectordb_data_ingestion_spark.sources.ntlm import http_ntlm_auth

    for bad_token in ("!!!not-base64!!!", base64.b64encode(
            b"NTLMSSP\x00\x02\x00\x00\x00short").decode()):
        class Handler(BaseHTTPRequestHandler):
            token = bad_token

            def do_GET(self):
                auth = self.headers.get("Authorization", "")
                self.send_response(401)
                if auth.startswith("NTLM "):
                    self.send_header("WWW-Authenticate",
                                     "NTLM " + self.token)
                else:
                    self.send_header("WWW-Authenticate", "NTLM")
                self.send_header("Content-Length", "0")
                self.end_headers()

            def log_message(self, *a):
                pass

        srv = HTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            r = requests.get(
                f"http://127.0.0.1:{srv.server_port}/",
                auth=http_ntlm_auth("Domain\\User", "Password"),
                timeout=10,
            )
            assert r.status_code == 401
        finally:
            srv.shutdown()


def test_parse_challenge_target_info_bounds():
    """A 48-byte-valid CHALLENGE whose TargetInfo pointer lands in the
    header or past the end must raise, not yield a truncated blob."""
    def challenge(ti_len, ti_off, tail=b""):
        return (
            b"NTLMSSP\x00" + struct.pack("<I", 2)
            + struct.pack("<HHI", 0, 0, 48)
            + struct.pack("<I", 1)
            + SERVER_CHALLENGE + b"\x00" * 8
            + struct.pack("<HHI", ti_len, ti_len, ti_off)
            + tail
        )

    with pytest.raises(ValueError, match="TargetInfo"):
        parse_challenge(challenge(4, 0xFFFFFFF0))
    with pytest.raises(ValueError, match="TargetInfo"):
        parse_challenge(challenge(4, 12))  # points into the header
    with pytest.raises(ValueError, match="TargetInfo"):
        parse_challenge(challenge(64, 48, tail=b"\x00" * 8))  # past end
    # zero-length TargetInfo stays legal
    sc, ti = parse_challenge(challenge(0, 0))
    assert sc == SERVER_CHALLENGE and ti == b""
