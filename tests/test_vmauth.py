"""vmauth auth proxy / router (victoriametrics_spark/vmauth.py) —
the reference's own test cases ported from
app/vmauth/target_url_test.go (TestDropPrefixParts,
TestCreateTargetURLSuccess) plus auth-config matching
(auth_config.go getAuthTokens semantics) and a live threaded-proxy
end-to-end test (routing + header injection + backend retry + 401/400).
"""

from __future__ import annotations

import base64
import http.server
import json
import threading
import urllib.error
import urllib.request

import pytest

from victoriametrics_spark.vmauth import (
    AuthConfig,
    VMAuthProxy,
    create_target_url,
    drop_prefix_parts,
    parse_user,
)

# ---------------------------------------------------- dropPrefixParts
DROP_CASES = [
    ("", 0, ""), ("", 1, ""), ("", 10, ""),
    ("foo", 0, "foo"), ("foo", -1, "foo"), ("foo", 1, ""),
    ("/foo", 0, "/foo"), ("/foo/bar", 0, "/foo/bar"),
    ("/foo/bar/baz", 0, "/foo/bar/baz"),
    ("foo/bar", 0, "foo/bar"), ("foo/bar/baz", 0, "foo/bar/baz"),
    ("/foo/", 0, "/foo/"), ("/foo/bar/", 0, "/foo/bar/"),
    ("/foo/bar/baz/", 0, "/foo/bar/baz/"),
    ("/foo", 1, ""), ("/foo/bar", 1, "/bar"), ("/foo/bar/baz", 1, "/bar/baz"),
    ("foo", 1, ""), ("foo/bar", 1, "/bar"), ("foo/bar/baz", 1, "/bar/baz"),
    ("/foo/", 1, "/"), ("/foo/bar/", 1, "/bar/"),
    ("/foo/bar/baz/", 1, "/bar/baz/"),
    ("/foo", 2, ""), ("/foo/bar", 2, ""), ("/foo/bar/baz", 2, "/baz"),
    ("foo", 2, ""), ("foo/bar", 2, ""), ("foo/bar/baz", 2, "/baz"),
    ("/foo/", 2, ""), ("/foo/bar/", 2, "/"), ("/foo/bar/baz/", 2, "/baz/"),
    ("/foo", 3, ""), ("/foo/bar", 3, ""), ("/foo/bar/baz", 3, ""),
    ("foo", 3, ""), ("foo/bar", 3, ""), ("foo/bar/baz", 3, ""),
    ("/foo/", 3, ""), ("/foo/bar/", 3, ""), ("/foo/bar/baz/", 3, "/"),
    ("/foo/", 4, ""),
]


@pytest.mark.parametrize("path,parts,want", DROP_CASES)
def test_drop_prefix_parts(path, parts, want):
    assert drop_prefix_parts(path, parts) == want


# ------------------------------------------------- createTargetURL
def _f(user_cfg, request_uri, want_target, want_req_headers="",
       want_resp_headers="", want_retry=None, want_lb="least_loaded",
       want_drop=0):
    ui = parse_user(user_cfg)
    target, up, hc = create_target_url(ui, request_uri)
    assert up is not None, f"no route for {request_uri!r}"
    assert target == want_target
    got_rq = "\n".join(f"{h.name}: {h.value}" for h in hc.request_headers)
    got_rs = "\n".join(f"{h.name}: {h.value}" for h in hc.response_headers)
    assert got_rq == want_req_headers
    assert got_rs == want_resp_headers
    assert up.retry_status_codes == want_retry
    assert up.load_balancing_policy == want_lb
    assert up.drop_src_path_prefix_parts == want_drop


def test_simple_url_prefix():
    for uri, want in [
        ("", "http://foo.bar"),
        ("/", "http://foo.bar"),
        ("http://aaa///", "http://foo.bar"),
        ("a/b?c=d", "http://foo.bar/a/b?c=d"),
        ("/a/b?c=d", "http://foo.bar/a/b?c=d"),
    ]:
        _f({"url_prefix": "http://foo.bar"}, uri, want)
    for uri, want in [
        ("/", "http://foo.bar/"),
        ("/x", "http://foo.bar/x"),
        ("/x/", "http://foo.bar/x/"),
        ("http://abc///x/", "http://foo.bar/x/"),
        ("http://foo//x", "http://foo.bar/x"),
        ("/a/b?c=d", "http://foo.bar/a/b?c=d"),
    ]:
        _f({"url_prefix": "http://foo.bar/"}, uri, want)
    _f({"url_prefix": "http://foo.bar/baz"}, "", "http://foo.bar/baz")
    _f({"url_prefix": "http://foo.bar/baz"}, "/", "http://foo.bar/baz")
    _f({"url_prefix": "http://foo.bar/x/"}, "/abc", "http://foo.bar/x/abc")
    _f({"url_prefix": "http://foo.bar/x/"}, "/abc/", "http://foo.bar/x/abc/")
    _f({"url_prefix": "http://foo.bar/federate"}, "/",
       "http://foo.bar/federate")
    _f({"url_prefix": "https://sss:3894/x/y"}, "/z",
       "https://sss:3894/x/y/z")
    # path-traversal neutralized (normalizeURL path.Clean)
    _f({"url_prefix": "https://sss:3894/x/y"}, "/../../aaa",
       "https://sss:3894/x/y/aaa")
    _f({"url_prefix": "https://sss:3894/x/y"},
       "/./asd/../../aaa?a=d&s=s/../d",
       "https://sss:3894/x/y/aaa?a=d&s=s%2F..%2Fd")


def test_headers_retry_lb_drop():
    _f(
        {
            "url_prefix": "http://foo.bar",
            "headers": ["bb: aaa"],
            "response_headers": ["x: y"],
            "retry_status_codes": [503, 501],
            "load_balancing_policy": "first_available",
            "drop_src_path_prefix_parts": 2,
        },
        "/a/b/c", "http://foo.bar/c", "bb: aaa", "x: y",
        [503, 501], "first_available", 2,
    )


_COMPLEX = {
    "url_map": [
        {
            "src_hosts": ["host42"],
            "src_paths": ["/vmsingle/api/v1/query"],
            "src_query_args": ["db=foo"],
            "url_prefix": "http://vmselect/0/prometheus",
            "headers": ["xx: aa", "yy: asdf"],
            "response_headers": ["qwe: rty"],
            "retry_status_codes": [503, 500, 501],
            "load_balancing_policy": "first_available",
            "drop_src_path_prefix_parts": 1,
        },
        {
            "src_paths": ["/api/v1/write"],
            "url_prefix": "http://vminsert/0/prometheus",
            "retry_status_codes": [],
            "drop_src_path_prefix_parts": 0,
        },
        {
            "src_paths": ["/metrics"],
            "url_prefix": "http://metrics-server",
        },
    ],
    "url_prefix": "http://default-server",
    "headers": ["bb: aaa"],
    "response_headers": ["x: y"],
    "retry_status_codes": [502],
    "drop_src_path_prefix_parts": 2,
}


def test_complex_url_map():
    _f(_COMPLEX, "http://host42/vmsingle/api/v1/query?query=up&db=foo",
       "http://vmselect/0/prometheus/api/v1/query?db=foo&query=up",
       "xx: aa\nyy: asdf", "qwe: rty", [503, 500, 501],
       "first_available", 1)
    _f(_COMPLEX, "http://host123/vmsingle/api/v1/query?query=up",
       "http://default-server/v1/query?query=up",
       "bb: aaa", "x: y", [502], "least_loaded", 2)
    _f(_COMPLEX, "https://foo-host/api/v1/write",
       "http://vminsert/0/prometheus/api/v1/write", "", "", [],
       "least_loaded", 0)
    _f(_COMPLEX, "https://foo-host/foo/bar/api/v1/query_range",
       "http://default-server/api/v1/query_range",
       "bb: aaa", "x: y", [502], "least_loaded", 2)
    _f(_COMPLEX, "https://foo-host/metrics", "http://metrics-server",
       "", "", [502], "least_loaded", 2)


def test_url_map_without_global_prefix():
    cfg = {
        "url_map": [
            {
                "src_paths": ["/api/v1/write"],
                "url_prefix": "http://vminsert/0/prometheus",
                "retry_status_codes": [],
                "drop_src_path_prefix_parts": 0,
            },
            {
                "src_paths": ["/metrics/a/b"],
                "url_prefix": "http://metrics-server",
            },
        ],
        "headers": ["bb: aaa"],
        "response_headers": ["x: y"],
        "retry_status_codes": [502],
        "drop_src_path_prefix_parts": 2,
    }
    _f(cfg, "https://foo-host/api/v1/write",
       "http://vminsert/0/prometheus/api/v1/write", "", "", [],
       "least_loaded", 0)
    _f(cfg, "https://foo-host/metrics/a/b", "http://metrics-server/b",
       "", "", [502], "least_loaded", 2)
    ui = parse_user(cfg)
    target, up, _ = create_target_url(ui, "/no/such/route")
    assert target is None and up is None


def test_regex_paths_url_map():
    cfg = {
        "url_map": [
            {
                "src_paths": [
                    "/api/v1/query(_range)?", "/api/v1/label/[^/]+/values"
                ],
                "url_prefix": "http://vmselect/0/prometheus",
            },
            {
                "src_paths": ["/api/v1/write"],
                "url_prefix": "http://vminsert/0/prometheus",
            },
            {
                "src_hosts": [r"vmui\..+"],
                "url_prefix": "http://vmui.host:1234/vmui/",
            },
        ],
        "url_prefix": "http://default-server",
    }
    _f(cfg, "/api/v1/query?query=up",
       "http://vmselect/0/prometheus/api/v1/query?query=up")
    _f(cfg, "/api/v1/query_range?query=up",
       "http://vmselect/0/prometheus/api/v1/query_range?query=up")
    _f(cfg, "/api/v1/label/foo/values",
       "http://vmselect/0/prometheus/api/v1/label/foo/values")
    _f(cfg, "/api/v1/write", "http://vminsert/0/prometheus/api/v1/write")
    _f(cfg, "/api/v1/foo/bar", "http://default-server/api/v1/foo/bar")
    _f(cfg, "https://vmui.foobar.com/a/b?c=d",
       "http://vmui.host:1234/vmui/a/b?c=d")


def test_backend_extra_label_args():
    _f({"url_prefix": "http://foo.bar?extra_label=team=dev"},
       "/api/v1/query", "http://foo.bar/api/v1/query?extra_label=team=dev")
    # clashing client arg is dropped for security; backend arg wins
    _f({"url_prefix": "http://foo.bar?extra_label=team=mobile"},
       "/api/v1/query?extra_label=team=dev",
       "http://foo.bar/api/v1/query?extra_label=team%3Dmobile")


def test_regex_query_args_url_map():
    cfg = {
        "url_map": [
            {
                "src_paths": ["/api/v1/query"],
                "src_query_args": ['query=~.*{.*env="dev".*}*.'],
                "url_prefix": "http://vmselect/0/prometheus",
            },
            {
                "src_paths": ["/api/v1/query"],
                "src_query_args": ['query=~.*{.*env="prod".*}.*'],
                "url_prefix": "http://vmselect/1/prometheus",
            },
        ],
        "url_prefix": "http://default-server",
    }
    _f(cfg, '/api/v1/query?query=up{env="prod"}',
       "http://vmselect/1/prometheus/api/v1/query?query=up%7Benv%3D%22prod%22%7D")
    _f(cfg, '/api/v1/query?query=up{foo="bar",env="dev",pod!=""}',
       "http://vmselect/0/prometheus/api/v1/query?query=up%7Bfoo%3D%22bar%22%2Cenv%3D%22dev%22%2Cpod%21%3D%22%22%7D")
    _f(cfg, '/api/v1/query?query=up{foo="bar"}',
       "http://default-server/api/v1/query?query=up%7Bfoo%3D%22bar%22%7D")


# --------------------------------------------------------- auth config
def _basic(user, pw):
    return "Basic " + base64.b64encode(f"{user}:{pw}".encode()).decode()


def test_auth_matching():
    cfg = AuthConfig.parse(
        {
            "users": [
                {"bearer_token": "XXXX", "url_prefix": "http://b1"},
                {"username": "foo", "password": "bar",
                 "url_prefix": "http://b2"},
            ]
        }
    )
    assert cfg.get_user(["Bearer XXXX"]).url_prefix.urls == ["http://b1"]
    # bearer token also accepted as Basic username with empty password
    assert cfg.get_user([_basic("XXXX", "")]).url_prefix.urls == ["http://b1"]
    # InfluxDB Token scheme folds into Bearer
    assert cfg.get_user(["Token XXXX"]).url_prefix.urls == ["http://b1"]
    assert cfg.get_user([_basic("foo", "bar")]).url_prefix.urls == [
        "http://b2"
    ]
    assert cfg.get_user([_basic("foo", "wrong")]) is None
    assert cfg.get_user(["Bearer nope"]) is None
    assert cfg.get_user([]) is None


def test_auth_config_errors():
    with pytest.raises(ValueError, match="username and password"):
        parse_user({"bearer_token": "x", "username": "u"})
    with pytest.raises(ValueError, match="duplicate"):
        AuthConfig.parse(
            {
                "users": [
                    {"bearer_token": "s", "url_prefix": "http://a"},
                    {"bearer_token": "s", "url_prefix": "http://b"},
                ]
            }
        )


# ------------------------------------------------------- live proxy e2e
class _Backend(http.server.BaseHTTPRequestHandler):
    fail_next = {}

    def log_message(self, *a):
        pass

    def do_GET(self):
        key = self.server.server_address[1]
        if _Backend.fail_next.get(key):
            _Backend.fail_next[key] -= 1
            self.send_response(503)
            self.end_headers()
            self.wfile.write(b"overloaded")
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(
            json.dumps(
                {
                    "port": key,
                    "path": self.path,
                    "got_header": self.headers.get("X-Tenant", ""),
                }
            ).encode()
        )


def _start_backend():
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Backend)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, httpd.server_address[1]


def test_proxy_end_to_end():
    b1, p1 = _start_backend()
    b2, p2 = _start_backend()
    cfg = AuthConfig.parse(
        {
            "users": [
                {
                    "bearer_token": "token-a",
                    "url_map": [
                        {
                            "src_paths": ["/select/.*"],
                            "url_prefix": [
                                f"http://127.0.0.1:{p1}",
                                f"http://127.0.0.1:{p2}",
                            ],
                            "drop_src_path_prefix_parts": 1,
                            "retry_status_codes": [503],
                            "load_balancing_policy": "first_available",
                            "headers": ["X-Tenant: team-a"],
                            "response_headers": ["X-Proxy: vmauth-spark"],
                        }
                    ],
                }
            ]
        }
    )
    proxy = VMAuthProxy(cfg)
    port = proxy.serve()
    try:
        # authorized + routed + request/response headers
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/select/api/v1/query?query=up",
            headers={"Authorization": "Bearer token-a"},
        )
        resp = urllib.request.urlopen(req, timeout=10)
        body = json.loads(resp.read())
        assert body["path"] == "/api/v1/query?query=up"
        assert body["got_header"] == "team-a"
        assert body["port"] in (p1, p2)
        assert resp.headers["X-Proxy"] == "vmauth-spark"

        # retry over backends on 503: first_available always tries p1
        # first; failing it once must fall through to p2
        _Backend.fail_next[p1] = 1
        resp = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/select/x",
                headers={"Authorization": "Bearer token-a"},
            ),
            timeout=10,
        )
        assert resp.status == 200
        assert json.loads(resp.read())["port"] == p2

        # 401 without credentials (no unauthorized_user configured)
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/select/x", timeout=10
            )
        assert e.value.code == 401
        assert "WWW-Authenticate" in e.value.headers

        # 400 on unrouted path for an authorized user
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                urllib.request.Request(
                    f"http://127.0.0.1:{port}/other/x",
                    headers={"Authorization": "Bearer token-a"},
                ),
                timeout=10,
            )
        assert e.value.code == 400
    finally:
        proxy.shutdown()
        b1.shutdown()
        b2.shutdown()


def test_proxy_unauthorized_user_section():
    b1, p1 = _start_backend()
    cfg = AuthConfig.parse(
        {
            "users": [],
            "unauthorized_user": {
                "url_prefix": f"http://127.0.0.1:{p1}",
            },
        }
    )
    proxy = VMAuthProxy(cfg)
    port = proxy.serve()
    try:
        resp = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/anything", timeout=10
        )
        assert json.loads(resp.read())["path"] == "/anything"
    finally:
        proxy.shutdown()
        b1.shutdown()


def test_proxy_fronting_engine_api(spark):
    """vmauth in front of this repo's own PromAPI HTTP server — the
    deployment the reference documents (vmauth -> vmselect): bearer
    auth, /select/<drop> routing, a real /api/v1/query through both
    hops."""
    from victoriametrics_spark.api import PromAPI, serve
    from victoriametrics_spark.schema import SAMPLE_SCHEMA

    rows = [
        ("temp", {"room": "x"}, ts, 20.0 + ts / 100_000, False)
        for ts in range(0, 2_100_000, 100_000)
    ]
    api = PromAPI(spark, spark.createDataFrame(rows, SAMPLE_SCHEMA))
    srv = serve(api, port=0)
    be_port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    cfg = AuthConfig.parse(
        {
            "users": [
                {
                    "bearer_token": "grafana-token",
                    "url_map": [
                        {
                            "src_paths": ["/select/.*"],
                            "url_prefix": f"http://127.0.0.1:{be_port}",
                            "drop_src_path_prefix_parts": 1,
                        }
                    ],
                }
            ]
        }
    )
    proxy = VMAuthProxy(cfg)
    port = proxy.serve()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/select/api/v1/query"
            "?query=last_over_time(temp%5B400s%5D)&time=1500",
            headers={"Authorization": "Bearer grafana-token"},
        )
        body = json.loads(urllib.request.urlopen(req, timeout=30).read())
        assert body["status"] == "success"
        (r,) = body["data"]["result"]
        assert r["metric"]["__name__"] == "temp"
        assert float(r["value"][1]) == 35.0
        # wrong token never reaches the engine
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                urllib.request.Request(
                    f"http://127.0.0.1:{port}/select/api/v1/query?query=up",
                    headers={"Authorization": "Bearer wrong"},
                ),
                timeout=10,
            )
        assert e.value.code == 401
    finally:
        proxy.shutdown()
        srv.shutdown()
