"""Pure-stdlib NTLM (MS-NLMP) authentication for the on-prem SharePoint
connector.

The reference authenticates with ``requests_ntlm`` / ``HttpNtlmAuth``
(sharepointutils.py:202-214); that package is not installed in every
deployment, but NTLM is a fully public protocol ([MS-NLMP]) whose crypto
is MD4 (RFC 1320) + HMAC-MD5 — both expressible with ``hashlib``/
``hmac`` plus the ~40-line MD4 below (OpenSSL 3 ships without MD4, so
``hashlib.new("md4")`` cannot be relied on).

Implemented: NTLMv2 only (NTOWFv2, NTLMv2_RESPONSE with the client
blob), NEGOTIATE / CHALLENGE / AUTHENTICATE message framing, and a
``requests``-compatible auth hook that replays the 401 handshake.
Session security (signing/sealing) is not implemented — the connector
runs over TLS like the reference. Correctness is pinned to the official
[MS-NLMP] 4.2 test vectors plus RFC 1320's MD4 vectors in
``tests/test_ntlm.py``.
"""

from __future__ import annotations

import base64
import hmac
import os
import struct
import time


# ---------------------------------------------------------------------------
# MD4 (RFC 1320) — pure Python
# ---------------------------------------------------------------------------

def _lrot(x: int, n: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF


def md4(data: bytes) -> bytes:
    msg = bytearray(data)
    bitlen = (8 * len(data)) & 0xFFFFFFFFFFFFFFFF
    msg.append(0x80)
    while len(msg) % 64 != 56:
        msg.append(0)
    msg += struct.pack("<Q", bitlen)
    a, b, c, d = 0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476
    for off in range(0, len(msg), 64):
        x = struct.unpack("<16I", msg[off: off + 64])
        aa, bb, cc, dd = a, b, c, d
        # round 1: F = (B & C) | (~B & D)
        for i, s in zip(range(16), [3, 7, 11, 19] * 4):
            if i % 4 == 0:
                a = _lrot(a + ((b & c) | (~b & d)) + x[i], s)
            elif i % 4 == 1:
                d = _lrot(d + ((a & b) | (~a & c)) + x[i], s)
            elif i % 4 == 2:
                c = _lrot(c + ((d & a) | (~d & b)) + x[i], s)
            else:
                b = _lrot(b + ((c & d) | (~c & a)) + x[i], s)
        # round 2: G = (B & C) | (B & D) | (C & D), +0x5a827999
        order2 = [0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11, 15]
        for j, k in enumerate(order2):
            s = [3, 5, 9, 13][j % 4]
            if j % 4 == 0:
                a = _lrot(a + ((b & c) | (b & d) | (c & d)) + x[k] + 0x5A827999, s)
            elif j % 4 == 1:
                d = _lrot(d + ((a & b) | (a & c) | (b & c)) + x[k] + 0x5A827999, s)
            elif j % 4 == 2:
                c = _lrot(c + ((d & a) | (d & b) | (a & b)) + x[k] + 0x5A827999, s)
            else:
                b = _lrot(b + ((c & d) | (c & a) | (d & a)) + x[k] + 0x5A827999, s)
        # round 3: H = B ^ C ^ D, +0x6ed9eba1
        order3 = [0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15]
        for j, k in enumerate(order3):
            s = [3, 9, 11, 15][j % 4]
            if j % 4 == 0:
                a = _lrot(a + (b ^ c ^ d) + x[k] + 0x6ED9EBA1, s)
            elif j % 4 == 1:
                d = _lrot(d + (a ^ b ^ c) + x[k] + 0x6ED9EBA1, s)
            elif j % 4 == 2:
                c = _lrot(c + (d ^ a ^ b) + x[k] + 0x6ED9EBA1, s)
            else:
                b = _lrot(b + (c ^ d ^ a) + x[k] + 0x6ED9EBA1, s)
        a = (a + aa) & 0xFFFFFFFF
        b = (b + bb) & 0xFFFFFFFF
        c = (c + cc) & 0xFFFFFFFF
        d = (d + dd) & 0xFFFFFFFF
    return struct.pack("<4I", a, b, c, d)


# ---------------------------------------------------------------------------
# NTLMv2 crypto ([MS-NLMP] 3.3.2)
# ---------------------------------------------------------------------------

def ntowf_v2(user: str, password: str, domain: str) -> bytes:
    """HMAC_MD5(MD4(UNICODE(password)), UNICODE(UPPER(user) + domain))."""
    key = md4(password.encode("utf-16-le"))
    return hmac.new(
        key, (user.upper() + domain).encode("utf-16-le"), "md5"
    ).digest()


def ntlmv2_temp(
    timestamp: int, client_challenge: bytes, target_info: bytes
) -> bytes:
    """The client blob ("temp"): Responserversion 1, HiResponserversion 1,
    6 reserved bytes, FILETIME, 8-byte client challenge, 4 reserved,
    target info, 4 reserved."""
    return (
        b"\x01\x01" + b"\x00" * 6
        + struct.pack("<Q", timestamp)
        + client_challenge
        + b"\x00" * 4
        + target_info
        + b"\x00" * 4
    )


def ntlmv2_response(
    ntowf: bytes,
    server_challenge: bytes,
    client_challenge: bytes,
    timestamp: int,
    target_info: bytes,
) -> tuple[bytes, bytes, bytes]:
    """(NTProofStr, NtChallengeResponse, SessionBaseKey)."""
    temp = ntlmv2_temp(timestamp, client_challenge, target_info)
    proof = hmac.new(ntowf, server_challenge + temp, "md5").digest()
    session_base_key = hmac.new(ntowf, proof, "md5").digest()
    return proof, proof + temp, session_base_key


# ---------------------------------------------------------------------------
# Message framing ([MS-NLMP] 2.2.1)
# ---------------------------------------------------------------------------

_SIGNATURE = b"NTLMSSP\x00"
# NEGOTIATE_UNICODE | NEGOTIATE_NTLM | NEGOTIATE_ALWAYS_SIGN |
# NEGOTIATE_EXTENDED_SESSIONSECURITY | REQUEST_TARGET
_NEG_FLAGS = 0x00000001 | 0x00000200 | 0x00008000 | 0x00080000 | 0x00000004


def negotiate_message() -> bytes:
    """Type 1: signature, type, flags, empty domain/workstation fields."""
    return (
        _SIGNATURE
        + struct.pack("<I", 1)
        + struct.pack("<I", _NEG_FLAGS)
        + struct.pack("<HHI", 0, 0, 32)  # domain: len, maxlen, offset
        + struct.pack("<HHI", 0, 0, 32)  # workstation
    )


def parse_challenge(message: bytes) -> tuple[bytes, bytes]:
    """Type 2 -> (server_challenge, target_info). The message is untrusted
    network input: anything shorter than the 48-byte fixed part ([MS-NLMP]
    2.2.1.2) or mis-typed raises ValueError — never struct.error — so the
    auth hook has one exception type to turn into a clean auth failure."""
    if len(message) < 48:
        raise ValueError("truncated NTLM CHALLENGE message")
    if message[:8] != _SIGNATURE or struct.unpack("<I", message[8:12])[0] != 2:
        raise ValueError("not an NTLM CHALLENGE message")
    server_challenge = message[24:32]
    ti_len, _ti_max, ti_off = struct.unpack("<HHI", message[40:48])
    if ti_len and (ti_off < 48 or ti_off + ti_len > len(message)):
        # a TargetInfo pointer into the header or past the end would
        # silently yield a truncated blob and a doomed AUTHENTICATE
        raise ValueError("NTLM CHALLENGE TargetInfo out of bounds")
    return server_challenge, message[ti_off: ti_off + ti_len]


def authenticate_message(
    user: str,
    password: str,
    domain: str,
    server_challenge: bytes,
    target_info: bytes,
    client_challenge: bytes | None = None,
    timestamp: int | None = None,
) -> bytes:
    """Type 3 with the NTLMv2 response (LmChallengeResponse left empty —
    servers requiring v2 ignore it per [MS-NLMP] 3.1.5.1.2)."""
    if client_challenge is None:
        client_challenge = os.urandom(8)
    if timestamp is None:
        # FILETIME: 100ns ticks since 1601-01-01
        timestamp = int((time.time() + 11644473600) * 10_000_000)
    ntowf = ntowf_v2(user, password, domain)
    _proof, nt_response, _sbk = ntlmv2_response(
        ntowf, server_challenge, client_challenge, timestamp, target_info
    )
    dom = domain.encode("utf-16-le")
    usr = user.encode("utf-16-le")
    wks = b""
    lm = b""
    header_len = 64
    payload = b""
    fields = []
    for blob in (lm, nt_response, dom, usr, wks):
        off = header_len + len(payload)
        fields.append(struct.pack("<HHI", len(blob), len(blob), off))
        payload += blob
    return (
        _SIGNATURE
        + struct.pack("<I", 3)
        + b"".join(fields)
        + struct.pack("<HHI", 0, 0, header_len + len(payload))  # session key
        + struct.pack("<I", _NEG_FLAGS)
        + payload
    )


# ---------------------------------------------------------------------------
# requests auth hook
# ---------------------------------------------------------------------------

def http_ntlm_auth(username: str, password: str):
    """``requests``-compatible NTLMv2 auth (drop-in for
    ``requests_ntlm.HttpNtlmAuth`` on the www-authenticate: NTLM 401
    handshake). ``username`` may be ``DOMAIN\\user``."""
    import requests.auth

    domain, _, user = username.rpartition("\\")

    class _NtlmAuth(requests.auth.AuthBase):
        def __call__(self, request):
            # remember where a seekable body starts: the handshake
            # re-sends the request twice, and a file-like body consumed
            # by the 401'd initial send would replay EMPTY (truncated
            # upload with a 200 auth success) — requests_ntlm rewinds
            # the same way
            self._body_pos = (
                request.body.tell()
                if request.body is not None
                and hasattr(request.body, "tell")
                else None
            )
            request.register_hook("response", self._respond)
            return request

        def _rewound(self, request):
            if self._body_pos is not None:
                request.body.seek(self._body_pos)
            return request

        @staticmethod
        def _ntlm_token(header: str) -> str | None:
            """The NTLM scheme's blob from a WWW-Authenticate header that
            may advertise several schemes ('Negotiate, NTLM' — requests
            joins multiple headers with ', '). Returns '' for a bare
            scheme offer, the base64 blob when present, None when NTLM
            is not offered."""
            for part in header.split(","):
                part = part.strip()
                if part == "NTLM":
                    return ""
                if part.startswith("NTLM "):
                    return part[5:].strip()
            return None

        def _respond(self, response, **kwargs):
            if response.status_code != 401:
                return response
            offer = self._ntlm_token(
                response.headers.get("WWW-Authenticate", "")
            )
            if offer is None:
                return response
            response.content  # drain so the connection can be reused
            response.raw.release_conn()
            # step 1: NEGOTIATE
            req1 = self._rewound(response.request.copy())
            req1.headers["Authorization"] = "NTLM " + base64.b64encode(
                negotiate_message()
            ).decode("ascii")
            resp1 = response.connection.send(req1, **kwargs)
            resp1.history.append(response)
            blob = self._ntlm_token(
                resp1.headers.get("WWW-Authenticate", "")
            )
            if not blob:
                return resp1
            try:
                challenge = base64.b64decode(blob)
                server_challenge, target_info = parse_challenge(challenge)
            except ValueError:
                # a server sending a garbled challenge is an auth failure,
                # not a client crash: surface the 401 to the caller
                # (binascii.Error from b64decode IS a ValueError subclass)
                return resp1
            # step 2: AUTHENTICATE
            resp1.content
            resp1.raw.release_conn()
            req2 = self._rewound(resp1.request.copy())
            req2.headers["Authorization"] = "NTLM " + base64.b64encode(
                authenticate_message(
                    user or username, password, domain,
                    server_challenge, target_info,
                )
            ).decode("ascii")
            resp2 = resp1.connection.send(req2, **kwargs)
            resp2.history.append(resp1)
            return resp2

    return _NtlmAuth()
