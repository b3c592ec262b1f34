"""Optional credential verification for the wire doors (HS2 / pgwire).

The deployed reference fronts its Thrift/REST listeners behind the
platform's auth stack (Keycloak + Vault —
``infrastructure/apps/keycloak/``,
``docs/components/vault-secrets-operator.md``); an in-process engine
can't run an IdP, but it CAN verify per-user credentials on the two
protocols that carry them natively: HS2's SASL PLAIN initial response
and pgwire's cleartext/md5 password messages.

Off by default — with no credentials configured both doors keep their
dev posture (accept-any PLAIN, trust auth). Credentials come from the
server constructor or, if absent there, the
``KONOHA_WIRE_CREDENTIALS`` environment variable
(``user:password,user2:password2``). Comparisons use
``hmac.compare_digest`` so a credential probe can't time its way to a
match.
"""

from __future__ import annotations

import hashlib
import hmac
import os

ENV_VAR = "KONOHA_WIRE_CREDENTIALS"


def resolve_credentials(
    credentials: dict[str, str] | None = None,
) -> dict[str, str] | None:
    """Constructor-provided credentials win; otherwise parse
    ``KONOHA_WIRE_CREDENTIALS``; otherwise None (auth disabled)."""
    if credentials is not None:
        return dict(credentials)
    raw = os.environ.get(ENV_VAR, "").strip()
    if not raw:
        return None
    out: dict[str, str] = {}
    for pair in raw.split(","):
        pair = pair.strip()
        if not pair:
            continue
        user, _, password = pair.partition(":")
        out[user] = password
    return out


def check_plain(creds: dict[str, str], user: str, password: str) -> bool:
    """Constant-time verification of a cleartext credential.

    Compares UTF-8 *bytes*: ``hmac.compare_digest`` raises TypeError on
    non-ASCII ``str`` inputs, so a legitimate UTF-8 password would crash
    the connection handler instead of authenticating.
    """
    pw = password.encode("utf-8")
    expected = creds.get(user)
    if expected is None:
        # burn a comparison anyway so unknown-user probes cost the same
        hmac.compare_digest(pw, pw)
        return False
    return hmac.compare_digest(expected.encode("utf-8"), pw)


def pg_md5_digest(user: str, password: str, salt: bytes) -> str:
    """The Postgres md5 password scheme:
    ``'md5' + md5hex(md5hex(password + user) + salt)`` — what a stock
    client sends in its PasswordMessage after an
    AuthenticationMD5Password request."""
    inner = hashlib.md5(password.encode() + user.encode()).hexdigest()
    return "md5" + hashlib.md5(inner.encode() + salt).hexdigest()


def check_pg_md5(
    creds: dict[str, str], user: str, response: str, salt: bytes
) -> bool:
    """Verify a pgwire md5 PasswordMessage against the stored
    cleartext credential (constant-time on the digest)."""
    expected = creds.get(user)
    if expected is None:
        hmac.compare_digest(response, response)
        return False
    return hmac.compare_digest(pg_md5_digest(user, expected, salt), response)
