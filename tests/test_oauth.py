"""Offline unit tests for OAuth 1.0a signing + the signed client's
retry / token-refresh state machine, and the S5 endpoint callables
(fetch_exercises / search_foods) over fixture-backed sources.

Signature vectors are FIXED (precomputed once from the public
HMAC-SHA1 / RFC 5849 construction) so a refactor that changes a byte
of the base string or signing key fails loudly — no network involved
anywhere.
"""

from __future__ import annotations

import json

import pytest

from calorista_spark.sources.oauth import (
    HttpDaySource,
    SignedApiClient,
    days_since_epoch,
    hmac_sha1_b64,
    oauth_request_params,
    parameter_string,
    sign_request,
    signature_base_string,
)
from calorista_spark.sources.rest import (
    FileFakeEndpointSource,
    fetch_exercises,
    search_foods,
)

URL = "https://platform.example.com/rest/server.api"

FIXED = {
    "method": "food_entries.get.v2",
    "format": "json",
    "oauth_consumer_key": "ck",
    "oauth_token": "tok",
    "oauth_timestamp": "1700000000",
    "oauth_nonce": "abcdef0123456789",
    "oauth_signature_method": "HMAC-SHA1",
    "oauth_version": "1.0",
    "date": 19723,
}

# precomputed from the public construction — see module docstring
EXPECTED_BASE = (
    "GET&https%3A%2F%2Fplatform.example.com%2Frest%2Fserver.api&"
    "date%3D19723%26format%3Djson%26method%3Dfood_entries.get.v2%26"
    "oauth_consumer_key%3Dck%26oauth_nonce%3Dabcdef0123456789%26"
    "oauth_signature_method%3DHMAC-SHA1%26oauth_timestamp%3D1700000000%26"
    "oauth_token%3Dtok%26oauth_version%3D1.0"
)
EXPECTED_SIG = "XaNrfvRm3cdE16pIYRBhPYsaRa4="


def test_hmac_sha1_rfc_vector():
    # public vector: HMAC-SHA1("key", "The quick brown fox ...")
    assert (
        hmac_sha1_b64("key", "The quick brown fox jumps over the lazy dog")
        == "3nybhbi3iqa8ino29wqQcBydtNk="
    )


def test_parameter_string_sorts_and_encodes():
    s = parameter_string({"b": "x y", "a": "1/2"})
    assert s == "a=1%2F2&b=x%20y"


def test_signature_base_string_fixed_vector():
    assert signature_base_string(URL, FIXED) == EXPECTED_BASE


def test_sign_request_fixed_vector():
    assert sign_request(URL, FIXED, "cs", "ts") == EXPECTED_SIG


def test_oauth_request_params_injectable_and_complete():
    p = oauth_request_params(
        "food_entries.get.v2",
        "ck",
        "tok",
        nonce="abcdef0123456789",
        timestamp="1700000000",
        extra={"date": 19723},
    )
    assert p == {k: str(v) for k, v in FIXED.items()}


def test_days_since_epoch_matches_reference_encoding():
    assert days_since_epoch("1970-01-01") == 0
    assert days_since_epoch("2024-01-01") == 19723


def _client(transport, refresh=None):
    return SignedApiClient(
        "ck", "cs", "tok", "ts",
        base_url=URL, transport=transport, refresh_tokens=refresh,
    )


def test_client_signs_every_request():
    seen = []

    def transport(url, params):
        seen.append(dict(params))
        return 200, '{"ok": true}'

    body = _client(transport).get("profile.get")
    assert body == '{"ok": true}'
    p = seen[0]
    # the signature the client sent verifies against its own params
    sig = p.pop("oauth_signature")
    assert sig == sign_request(URL, p, "cs", "ts")


def test_client_refreshes_on_token_error_and_resigns():
    calls = []

    def transport(url, params):
        calls.append(dict(params))
        if params["oauth_token"] == "expired":
            return 401, "invalid token"
        return 200, "fresh-payload"

    client = SignedApiClient(
        "ck", "cs", "expired", "old",
        base_url=URL, transport=transport,
        refresh_tokens=lambda: ("tok2", "ts2"),
    )
    assert client.get("profile.get") == "fresh-payload"
    assert [c["oauth_token"] for c in calls] == ["expired", "tok2"]
    sig = calls[1].pop("oauth_signature")
    assert sig == sign_request(URL, calls[1], "cs", "ts2")


def test_client_retries_transport_errors_then_raises():
    n = {"count": 0}

    def flaky(url, params):
        n["count"] += 1
        raise ConnectionError("boom")

    with pytest.raises(ConnectionError):
        _client(flaky).get("profile.get")
    assert n["count"] == 3  # initial + max_retries=2


def test_client_raises_on_hard_error():
    with pytest.raises(RuntimeError, match="500"):
        _client(lambda u, p: (500, "server error")).get("profile.get")


def test_http_day_source_encodes_date(tmp_path):
    seen = {}

    def transport(url, params):
        seen.update(params)
        return 200, '{"food_entries": []}'

    src = HttpDaySource(_client(transport))
    assert src("2024-01-01") == '{"food_entries": []}'
    assert seen["date"] == "19723"
    assert seen["method"] == "food_entries.get.v2"


@pytest.fixture()
def endpoint_dir(tmp_path):
    (tmp_path / "exercises.get.json").write_text(
        json.dumps({"exercises": [{"name": "walking", "minutes": 30}]})
    )
    (tmp_path / "exercises.get__date=2024-01-05.json").write_text(
        json.dumps({"exercises": [{"name": "running", "minutes": 20}]})
    )
    (
        tmp_path
        / "foods.search__max_results=2__search_expression=apple.json"
    ).write_text(json.dumps({"foods": [{"name": "apple"}, {"name": "apple pie"}]}))
    return str(tmp_path)


def test_fetch_exercises_no_date(spark, endpoint_dir):
    row = fetch_exercises(spark, FileFakeEndpointSource(endpoint_dir)).collect()[0]
    assert row.date is None
    assert "walking" in row.payload


def test_fetch_exercises_date_filter_reaches_request(spark, endpoint_dir):
    row = fetch_exercises(
        spark, FileFakeEndpointSource(endpoint_dir), date="2024-01-05"
    ).collect()[0]
    assert row.date == "2024-01-05"
    assert "running" in row.payload  # date-keyed fixture ⇒ param was sent


def test_search_foods_limit_pushdown(spark, endpoint_dir):
    row = search_foods(
        spark, FileFakeEndpointSource(endpoint_dir), "apple", max_results=2
    ).collect()[0]
    assert row.query == "apple" and row.max_results == 2
    # max_results-keyed fixture ⇒ the limit rode in the request itself
    assert len(json.loads(row.payload)["foods"]) == 2


def test_search_foods_unknown_query_yields_null_payload(spark, endpoint_dir):
    row = search_foods(
        spark, FileFakeEndpointSource(endpoint_dir), "durian", max_results=2
    ).collect()[0]
    assert row.payload is None


# ---------------------------------------------------------------------------
# 3-legged flow (offline, canned token responses)
# ---------------------------------------------------------------------------

from calorista_spark.sources.oauth import (  # noqa: E402
    ThreeLeggedFlow,
    parse_token_response,
)


def test_parse_token_response():
    assert parse_token_response("oauth_token=a&oauth_token_secret=b") == {
        "oauth_token": "a",
        "oauth_token_secret": "b",
    }


def _flow(transport):
    return ThreeLeggedFlow(
        "ck", "cs",
        request_token_url="https://auth.example.com/oauth/request_token",
        access_token_url="https://auth.example.com/oauth/access_token",
        transport=transport,
    )


def test_request_token_leg_signed_with_empty_token_secret():
    seen = {}

    def transport(url, params):
        seen["url"], seen["params"] = url, dict(params)
        return 200, "oauth_token=rt&oauth_token_secret=rts"

    out = _flow(transport).request_token(callback_url="http://cb/done")
    assert out == {"oauth_token": "rt", "oauth_token_secret": "rts"}
    p = seen["params"]
    assert p["oauth_callback"] == "http://cb/done"
    assert "oauth_token" not in p  # leg 1 carries no token
    sig = p.pop("oauth_signature")
    # leg-1 signing key is "cs&" (empty token secret)
    assert sig == sign_request(seen["url"], p, "cs", "")


def test_access_token_leg_signed_with_request_secret_and_verifier():
    seen = {}

    def transport(url, params):
        seen["url"], seen["params"] = url, dict(params)
        return 200, "oauth_token=at&oauth_token_secret=ats"

    out = _flow(transport).access_token("rt", "rts", "verif123")
    assert out == {"oauth_token": "at", "oauth_token_secret": "ats"}
    p = seen["params"]
    assert p["oauth_token"] == "rt" and p["oauth_verifier"] == "verif123"
    sig = p.pop("oauth_signature")
    assert sig == sign_request(seen["url"], p, "cs", "rts")


def test_authorization_url_encodes_callback():
    url = _flow(None).authorization_url("rt", "http://localhost:8080/callback")
    assert "oauth_token=rt" in url
    assert "http%3A%2F%2Flocalhost%3A8080%2Fcallback" in url


def test_flow_leg_raises_on_error():
    with pytest.raises(RuntimeError, match="401"):
        _flow(lambda u, p: (401, "denied")).request_token()


def test_full_flow_chains_to_usable_client():
    # end-to-end offline: request token -> verifier -> access token ->
    # signed API call with the obtained credentials
    def auth_transport(url, params):
        if url.endswith("request_token"):
            return 200, "oauth_token=rt&oauth_token_secret=rts"
        assert params["oauth_token"] == "rt"
        return 200, "oauth_token=at&oauth_token_secret=ats"

    flow = _flow(auth_transport)
    rt = flow.request_token()
    tokens = flow.access_token(
        rt["oauth_token"], rt["oauth_token_secret"], "v"
    )

    seen = {}

    def api_transport(url, params):
        seen.update(params)
        return 200, "{}"

    client = SignedApiClient(
        "ck", "cs", tokens["oauth_token"], tokens["oauth_token_secret"],
        base_url=URL, transport=api_transport,
    )
    client.get("profile.get")
    sig = seen.pop("oauth_signature")
    assert seen["oauth_token"] == "at"
    assert sig == sign_request(URL, seen, "cs", "ats")


# ---------------------------------------------------------------------------
# r6: callback leg (reference auth.py:55-62,117-134) + stricter
# token-error detection (ADVICE round 5).
# ---------------------------------------------------------------------------

from calorista_spark.sources.oauth import (  # noqa: E402
    CallbackVerifierReceiver,
    default_token_error,
    parse_callback_request,
)


def test_parse_callback_request_forms():
    want = {"oauth_token": "rt", "oauth_verifier": "v123"}
    assert parse_callback_request(
        "GET /callback?oauth_token=rt&oauth_verifier=v123 HTTP/1.1"
    ) == want
    assert parse_callback_request(
        "http://localhost:8080/callback?oauth_token=rt&oauth_verifier=v123"
    ) == want
    assert parse_callback_request(
        "/callback?oauth_verifier=v123&oauth_token=rt"
    ) == want
    assert parse_callback_request(want) == want
    # verifier-only callbacks are legal (token echo is optional)
    assert parse_callback_request("/cb?oauth_verifier=v") == {
        "oauth_verifier": "v"
    }
    with pytest.raises(ValueError, match="no oauth_verifier"):
        parse_callback_request("/callback?oauth_token=rt")


def test_receiver_handle_is_socket_free():
    r = CallbackVerifierReceiver()
    body = r.handle("GET /callback?oauth_token=rt&oauth_verifier=zz HTTP/1.1")
    assert body == CallbackVerifierReceiver.RESPONSE_BODY
    assert r.verifier == "zz"
    assert r.captured == {"oauth_token": "rt", "oauth_verifier": "zz"}


def test_complete_from_callback_closes_legs_2_and_3():
    seen = {}

    def transport(url, params):
        seen["url"], seen["params"] = url, dict(params)
        return 200, "oauth_token=at&oauth_token_secret=ats"

    flow = _flow(transport)
    rt = {"oauth_token": "rt", "oauth_token_secret": "rts"}
    out = flow.complete_from_callback(
        rt, "/callback?oauth_token=rt&oauth_verifier=v9"
    )
    assert out == {"oauth_token": "at", "oauth_token_secret": "ats"}
    p = seen["params"]
    assert p["oauth_token"] == "rt" and p["oauth_verifier"] == "v9"
    sig = p.pop("oauth_signature")
    assert sig == sign_request(seen["url"], p, "cs", "rts")


def test_complete_from_callback_rejects_crossed_token():
    flow = _flow(lambda u, p: (200, "oauth_token=at&oauth_token_secret=x"))
    rt = {"oauth_token": "rt", "oauth_token_secret": "rts"}
    with pytest.raises(ValueError, match="does not match"):
        flow.complete_from_callback(
            rt, "/callback?oauth_token=OTHER&oauth_verifier=v"
        )


def test_receiver_loopback_server_end_to_end():
    # the real daemon-thread server, like the reference — but on an
    # ephemeral port and bounded wait. Skip gracefully if the sandbox
    # forbids even loopback sockets.
    import urllib.error
    import urllib.request

    r = CallbackVerifierReceiver()
    try:
        cb_url = r.start()
    except OSError as exc:  # pragma: no cover - sandbox dependent
        pytest.skip(f"loopback sockets unavailable: {exc}")
    try:
        with urllib.request.urlopen(
            f"{cb_url}?oauth_token=rt&oauth_verifier=live1", timeout=5
        ) as resp:
            assert resp.read().decode() == CallbackVerifierReceiver.RESPONSE_BODY
        assert r.wait(timeout=5) == {
            "oauth_token": "rt",
            "oauth_verifier": "live1",
        }
    finally:
        r.stop()


def test_default_token_error_scoping():
    # structured JSON error: message decides, any status
    assert default_token_error(
        400, '{"error": {"code": 13, "message": "Invalid token"}}'
    )
    assert not default_token_error(
        400, '{"error": {"code": 2, "message": "Missing scope"}}'
    )
    # unstructured bodies: only auth statuses may substring-match
    assert default_token_error(401, "invalid token")
    assert not default_token_error(
        400, "parameter 'token' is not recognized"
    )
    assert not default_token_error(500, "token store on fire")


def test_default_transport_against_local_http_server():
    """r11 (VERDICT r10 #8): the DEFAULT transport — previously only
    ever replaced by fakes — drives a real socket against a stdlib
    http.server: signed params arrive on the query string, 200 bodies
    return, non-2xx returns (status, body) without raising so the
    retry/refresh machinery above sees the same shape as with
    ``requests``, and a token-error → refresh → retry round-trip works
    over the wire."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    from calorista_spark.sources.oauth import (
        SignedApiClient,
        _requests_transport,
    )

    seen: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API
            q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
            seen.append(q)
            if q.get("method") == "boom":
                body = json.dumps(
                    {"error": {"code": 13, "message": "invalid token"}}
                ).encode()
                # first call fails with a token error; after the
                # client refreshes (token becomes 'tok2') it succeeds
                if q.get("oauth_token") != "tok2":
                    self.send_response(401)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
            payload = json.dumps({"ok": True, "method": q.get("method")}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # quiet test output
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}/rest/server.api"
        client = SignedApiClient(
            "ck", "cs", "tok", "ts", base_url=base
        )  # transport defaulted — the wiring under test
        assert client.transport is _requests_transport
        body = json.loads(client.get("profile.get"))
        assert body == {"ok": True, "method": "profile.get"}
        # the signed params actually crossed the socket
        assert seen[0]["method"] == "profile.get"
        assert seen[0]["oauth_consumer_key"] == "ck"
        assert "oauth_signature" in seen[0]
        # token-error over the wire → refresh → retried OK
        client.refresh_tokens = lambda: ("tok2", "ts2")
        assert json.loads(client.get("boom"))["ok"] is True
        assert client.token == "tok2"
        # a non-2xx without refresh surfaces as the typed error
        client2 = SignedApiClient(
            "ck", "cs", "tok", "ts", base_url=base, max_retries=1
        )
        with pytest.raises(RuntimeError, match="401"):
            client2.get("boom")
    finally:
        srv.shutdown()
        srv.server_close()


def test_interactive_authorize_full_wire_roundtrip():
    """r11: the whole interactive 3-legged flow over REAL sockets and
    the REAL default transport — a stdlib fake provider serves the
    request-token and access-token legs and 302-redirects the
    'browser' (urllib, following redirects) to the loopback receiver;
    interactive_authorize wires receiver + legs + verifier exchange
    into the finished access token. This is the reference's
    credential_engine orchestration with zero fakes in the path."""
    import json as _json
    import threading
    import urllib.request
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlencode, urlparse

    from calorista_spark.sources.oauth import (
        ThreeLeggedFlow,
        interactive_authorize,
    )

    provider_seen: dict[str, dict] = {}

    class Provider(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            if u.path == "/oauth/request_token":
                provider_seen["request"] = q
                assert q["oauth_callback"].startswith("http://127.0.0.1:")
                self._ok("oauth_token=rtok&oauth_token_secret=rsec")
            elif u.path == "/oauth/authorize":
                # the user consents; the provider redirects the
                # browser to the registered callback with a verifier
                provider_seen["authorize"] = q
                cb = q["oauth_callback"]
                self.send_response(302)
                self.send_header(
                    "Location",
                    cb
                    + "?"
                    + urlencode(
                        {"oauth_token": q["oauth_token"],
                         "oauth_verifier": "ver123"}
                    ),
                )
                self.end_headers()
            elif u.path == "/oauth/access_token":
                provider_seen["access"] = q
                assert q["oauth_token"] == "rtok"
                assert q["oauth_verifier"] == "ver123"
                self._ok("oauth_token=atok&oauth_token_secret=asec")
            else:
                self._ok(_json.dumps({"err": "unknown"}), 404)

        def _ok(self, body, status=200):
            payload = body.encode()
            self.send_response(status)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Provider)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}/oauth"
        flow = ThreeLeggedFlow(
            "ck",
            "cs",
            request_token_url=f"{base}/request_token",
            access_token_url=f"{base}/access_token",
            authorize_url=f"{base}/authorize",
        )  # transport defaulted — real urllib over the wire
        tokens = interactive_authorize(
            flow,
            open_url=lambda url: urllib.request.urlopen(url, timeout=10),
            timeout=30,
        )
        assert tokens == {
            "oauth_token": "atok",
            "oauth_token_secret": "asec",
        }
        # every leg was signed over the wire
        for leg in ("request", "access"):
            assert "oauth_signature" in provider_seen[leg], leg
    finally:
        srv.shutdown()
        srv.server_close()
