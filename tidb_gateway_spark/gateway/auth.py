"""Authentication terminus.

The reference never verifies credentials itself — it forces the backend
to re-run auth with the real client by advertising an invalid plugin
(gateway/gateway.go:140-143, constants.go:70) and relaying the exchange
(gateway.go:213-240).  With no backend, this frontend IS the auth
terminus: it implements ``mysql_native_password`` verification against a
configured user table, or accepts any credentials when none configured
(the default for an analytics sidecar behind private networking).
"""

from __future__ import annotations

import hashlib


def native_scramble(password: str, nonce: bytes) -> bytes:
    """Client-side proof: SHA1(pw) XOR SHA1(nonce + SHA1(SHA1(pw)))."""
    p1 = hashlib.sha1(password.encode()).digest()
    p2 = hashlib.sha1(p1).digest()
    mix = hashlib.sha1(nonce + p2).digest()
    return bytes(a ^ b for a, b in zip(p1, mix))


def verify_native(password: str, nonce: bytes, auth_response: bytes) -> bool:
    return native_scramble(password, nonce) == auth_response


class Authenticator:
    def __init__(self, users: dict[str, str] | None = None):
        self.users = users

    def check(self, username: str, nonce: bytes, auth_response: bytes) -> bool:
        if self.users is None:
            return True  # accept-any mode
        if username not in self.users:
            return False
        password = self.users[username]
        if password == "":
            return auth_response in (b"", b"\x00" * len(auth_response))
        return verify_native(password, nonce, auth_response)
