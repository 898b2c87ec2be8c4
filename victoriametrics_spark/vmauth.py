"""vmauth — auth proxy / request router (app/vmauth analog).

The reference's vmauth sits in front of the query/ingest HTTP APIs and
maps incoming credentials to per-user routing rules
(app/vmauth/auth_config.go, target_url.go, main.go):

- users match by ``Authorization`` header (Bearer / Basic; InfluxDB
  ``Token`` scheme folded into Bearer) or URL userinfo;
- each user carries ``url_map`` entries (src_paths / src_hosts /
  src_query_args / src_headers, all fully-anchored RE2-style regexes)
  routed to a ``url_prefix`` (one or more backends with a
  load-balancing policy), plus a default ``url_prefix``;
- the target URL merges the backend prefix with the (cleaned) request
  path after dropping ``drop_src_path_prefix_parts`` path parts, and
  merges query args with backend args winning clashes
  (mergeURLs, target_url.go:11-48);
- per-route request/response headers, retry_status_codes and an
  ``unauthorized_user`` section.

This module re-implements that contract verbatim (the reference's
TestDropPrefixParts / TestCreateTargetURLSuccess cases are ported in
tests/test_vmauth.py) and ships a working threaded proxy
(``VMAuthProxy``) that fronts any HTTP backend — including this repo's
own PromAPI server — with auth, routing, header injection and
retry-over-backends.  JWT/OIDC/mTLS claims auth (vmauth enterprise)
is N/A here: it needs external identity providers.
"""

from __future__ import annotations

import base64
import posixpath
import re
from dataclasses import dataclass, field
from urllib.parse import parse_qsl, quote, urlsplit, urlunsplit


# ----------------------------------------------------------- primitives
def drop_prefix_parts(path: str, parts: int) -> str:
    """target_url.go dropPrefixParts."""
    if parts <= 0:
        return path
    while parts > 0:
        path = path.removeprefix("/")
        n = path.find("/")
        if n < 0:
            return ""
        path = path[n:]
        parts -= 1
    return path


def _path_clean(p: str) -> str:
    """Go path.Clean (lexical): collapse //, resolve . and .., '' -> '.'"""
    if p == "":
        return "."
    out = posixpath.normpath(p)
    if out.startswith("//"):
        # posixpath.normpath preserves a leading "//" (POSIX quirk);
        # Go path.Clean collapses it
        out = "/" + out.lstrip("/")
    return out


def normalize_url(path: str) -> str:
    """target_url.go normalizeURL on the path component."""
    orig = path
    p = _path_clean(path)
    if p == ".":
        p = "/"
    # Go path.Clean resolves leading /.. to /
    while p.startswith("/../"):
        p = p[3:]
    if p == "/..":
        p = "/"
    if not p.endswith("/") and orig.endswith("/"):
        p += "/"
    if not p.startswith("/"):
        p = "/" + p
    if p == "/":
        p = ""
    return p


class Regex:
    """Fully-anchored regex (auth_config.go Regex: ^(?:...)$)."""

    def __init__(self, pattern: str):
        self.pattern = pattern
        self._re = re.compile(f"^(?:{pattern})$")

    def match(self, s: str) -> bool:
        return self._re.match(s) is not None

    def __repr__(self):
        return f"Regex({self.pattern!r})"


def get_regexs(patterns: list[str]) -> list[Regex]:
    return [Regex(p) for p in patterns]


@dataclass
class Header:
    name: str
    value: str

    @classmethod
    def parse(cls, s: str) -> "Header":
        # config syntax: "Name: value" (quotes already stripped by YAML)
        name, _, value = s.partition(":")
        return cls(name.strip(), value.strip())


@dataclass
class QueryArg:
    name: str
    value: Regex

    @classmethod
    def parse(cls, s: str) -> "QueryArg":
        # auth_config.go QueryArg: "name=literal" (quoted) or
        # "name=~regex"
        name, eq, expr = s.partition("=")
        if not eq:
            return cls("", Regex("$^"))  # Name empty -> never matches
        if expr.startswith("~"):
            return cls(name, Regex(expr[1:]))
        return cls(name, Regex(re.escape(expr)))


@dataclass
class HeadersConf:
    request_headers: list[Header] = field(default_factory=list)
    response_headers: list[Header] = field(default_factory=list)


@dataclass
class URLPrefix:
    """One or more backend URLs + the routing knobs that ride along
    (auth_config.go URLPrefix after loading inherits the user-level
    values; tests assert the inherited results)."""

    urls: list[str]
    load_balancing_policy: str = "least_loaded"
    retry_status_codes: list[int] | None = None
    drop_src_path_prefix_parts: int = 0
    merge_query_args: list[str] = field(default_factory=list)
    _next: int = 0

    def get_backend_url(self) -> str:
        if self.load_balancing_policy == "first_available":
            return self.urls[0]
        # least_loaded: with no in-flight tracking needed for the local
        # threaded proxy, round-robin is the fair-share equivalent
        u = self.urls[self._next % len(self.urls)]
        self._next += 1
        return u

    def backend_urls_in_order(self) -> list[str]:
        """Retry order: chosen backend first, then the rest."""
        first = self.get_backend_url()
        return [first] + [u for u in self.urls if u != first]


@dataclass
class URLMap:
    src_paths: list[Regex] = field(default_factory=list)
    src_hosts: list[Regex] = field(default_factory=list)
    src_query_args: list[QueryArg] = field(default_factory=list)
    src_headers: list[Header] = field(default_factory=list)
    url_prefix: URLPrefix | None = None
    headers_conf: HeadersConf = field(default_factory=HeadersConf)


def _match_any_regex(rs: list[Regex], s: str) -> bool:
    return not rs or any(r.match(s) for r in rs)


def _match_any_query_arg(qas: list[QueryArg], args: dict) -> bool:
    if not qas:
        return True
    for qa in qas:
        for v in args.get(qa.name, []):
            if qa.value.match(v):
                return True
    return False


def _match_any_header(headers: list[Header], h: dict) -> bool:
    if not headers:
        return True
    return any(hdr.value in h.get(hdr.name, []) for hdr in headers)


@dataclass
class UserInfo:
    name: str = ""
    auth_tokens: list[str] = field(default_factory=list)
    url_maps: list[URLMap] = field(default_factory=list)
    url_prefix: URLPrefix | None = None
    headers_conf: HeadersConf = field(default_factory=HeadersConf)

    def get_url_prefix_and_headers(
        self, path: str, host: str, query: dict, headers: dict
    ) -> tuple[URLPrefix | None, HeadersConf]:
        """target_url.go getURLPrefixAndHeaders."""
        for e in self.url_maps:
            if not _match_any_regex(e.src_hosts, host):
                continue
            if not _match_any_regex(e.src_paths, path):
                continue
            if not _match_any_query_arg(e.src_query_args, query):
                continue
            if not _match_any_header(e.src_headers, headers):
                continue
            return e.url_prefix, e.headers_conf
        if self.url_prefix is not None:
            return self.url_prefix, self.headers_conf
        return None, HeadersConf()


def merge_urls(
    backend_url: str,
    req_path: str,
    req_query: list[tuple[str, str]],
    drop_src_path_prefix_parts: int = 0,
    merge_query_args: list[str] | None = None,
) -> str:
    """target_url.go mergeURLs: backend prefix + cleaned source path,
    query merged with backend args winning clashes (unless listed in
    merge_query_args); output args sorted like Go url.Values.Encode."""
    scheme, netloc, bpath, bquery, _ = urlsplit(backend_url)
    src_path = drop_prefix_parts(req_path, drop_src_path_prefix_parts)
    tpath = bpath
    if src_path.startswith("/"):
        # Go strings.TrimSuffix removes ONE trailing slash
        tpath = bpath[:-1] if bpath.endswith("/") else bpath
    tpath += src_path
    bargs = parse_qsl(bquery, keep_blank_values=True)
    if not req_query:
        q = bquery
    else:
        merge = set(merge_query_args or [])
        bkeys = {k for k, _ in bargs}
        out = list(bargs)
        for k, v in req_query:
            if k in bkeys and k not in merge:
                continue  # clashed client arg skipped for security
            out.append((k, v))
        # Go url.Values.Encode(): keys sorted, values in insert order
        by_key: dict[str, list[str]] = {}
        for k, v in out:
            by_key.setdefault(k, []).append(v)
        q = "&".join(
            f"{quote(k, safe='')}={quote(v, safe='')}"
            for k in sorted(by_key)
            for v in by_key[k]
        )
    return urlunsplit((scheme, netloc, tpath, q, ""))


def create_target_url(ui: UserInfo, request_uri: str):
    """Resolve a request URI through a user's routing config — returns
    (target_url, url_prefix, headers_conf) or (None, None, conf)."""
    scheme, netloc, path, query, _ = urlsplit(request_uri)
    path = normalize_url(path)
    qargs = parse_qsl(query, keep_blank_values=True)
    qdict: dict[str, list[str]] = {}
    for k, v in qargs:
        qdict.setdefault(k, []).append(v)
    up, hc = ui.get_url_prefix_and_headers(path, netloc, qdict, {})
    if up is None:
        return None, None, hc
    target = merge_urls(
        up.get_backend_url(),
        path,
        qargs,
        up.drop_src_path_prefix_parts,
        up.merge_query_args,
    )
    return target, up, hc


# ------------------------------------------------------------- config
def _http_auth_bearer(token: str) -> str:
    return "http_auth:Bearer " + token


def _http_auth_basic(username: str, password: str) -> str:
    tok = base64.b64encode(f"{username}:{password}".encode()).decode()
    return "http_auth:Basic " + tok


def _parse_url_prefix(v, defaults: dict) -> URLPrefix:
    if isinstance(v, str):
        urls = [v]
    elif isinstance(v, list):
        urls = [u if isinstance(u, str) else u["url"] for u in v]
    else:
        raise ValueError(f"unsupported url_prefix: {v!r}")
    return URLPrefix(
        urls=urls,
        load_balancing_policy=defaults.get(
            "load_balancing_policy", "least_loaded"
        ),
        retry_status_codes=defaults.get("retry_status_codes"),
        drop_src_path_prefix_parts=defaults.get(
            "drop_src_path_prefix_parts", 0
        )
        or 0,
        merge_query_args=defaults.get("merge_query_args", []) or [],
    )


def parse_user(u: dict) -> UserInfo:
    """auth_config.go UserInfo unmarshal + URL-prefix knob inheritance
    (url_map entries fall back to user-level values)."""
    ui = UserInfo(name=u.get("name") or u.get("username", ""))
    auth_token = u.get("auth_token", "")
    bearer = u.get("bearer_token", "")
    username, password = u.get("username", ""), u.get("password", "")
    if auth_token:
        if bearer or username or password:
            raise ValueError(
                "bearer_token/username/password cannot be set with auth_token"
            )
        ui.auth_tokens = ["http_auth:" + auth_token]
    elif bearer:
        if username or password:
            raise ValueError(
                "username and password cannot be specified if bearer_token is set"
            )
        # bearer also accepted as Basic username with empty password
        ui.auth_tokens = [
            _http_auth_bearer(bearer),
            _http_auth_basic(bearer, ""),
        ]
    elif username:
        ui.auth_tokens = [_http_auth_basic(username, password)]
    user_defaults = {
        "load_balancing_policy": u.get(
            "load_balancing_policy", "least_loaded"
        ),
        "retry_status_codes": u.get("retry_status_codes"),
        "drop_src_path_prefix_parts": u.get("drop_src_path_prefix_parts"),
        "merge_query_args": u.get("merge_query_args"),
    }
    ui.headers_conf = HeadersConf(
        [Header.parse(h) for h in u.get("headers", [])],
        [Header.parse(h) for h in u.get("response_headers", [])],
    )
    for m in u.get("url_map", []):
        entry_defaults = {
            k: (m[k] if k in m else user_defaults.get(k))
            for k in user_defaults
        }
        ui.url_maps.append(
            URLMap(
                src_paths=get_regexs(m.get("src_paths", [])),
                src_hosts=get_regexs(m.get("src_hosts", [])),
                src_query_args=[
                    QueryArg.parse(q) for q in m.get("src_query_args", [])
                ],
                src_headers=[
                    Header.parse(h) for h in m.get("src_headers", [])
                ],
                url_prefix=_parse_url_prefix(
                    m["url_prefix"], entry_defaults
                ),
                headers_conf=HeadersConf(
                    [Header.parse(h) for h in m.get("headers", [])],
                    [Header.parse(h) for h in m.get("response_headers", [])],
                ),
            )
        )
    if "url_prefix" in u:
        ui.url_prefix = _parse_url_prefix(u["url_prefix"], user_defaults)
    return ui


class AuthConfig:
    """users.yml analog: token -> UserInfo + optional unauthorized_user."""

    def __init__(self, users: list[UserInfo], unauthorized: UserInfo | None):
        self.by_token: dict[str, UserInfo] = {}
        for ui in users:
            for t in ui.auth_tokens:
                if t in self.by_token:
                    raise ValueError(f"duplicate auth token for {ui.name!r}")
                self.by_token[t] = ui
        self.unauthorized = unauthorized

    @classmethod
    def parse(cls, cfg: dict) -> "AuthConfig":
        users = [parse_user(u) for u in cfg.get("users", [])]
        unauthorized = None
        if "unauthorized_user" in cfg:
            unauthorized = parse_user(cfg["unauthorized_user"])
        return cls(users, unauthorized)

    @classmethod
    def load(cls, path: str) -> "AuthConfig":
        import yaml

        with open(path) as f:
            return cls.parse(yaml.safe_load(f))

    def get_user(self, auth_headers: list[str]) -> UserInfo | None:
        """main.go: each allowed auth header tried; InfluxDB 'Token'
        scheme folds into Bearer."""
        for ah in auth_headers:
            if ah.startswith("Token "):
                ah = "Bearer " + ah[len("Token ") :]
            ui = self.by_token.get("http_auth:" + ah)
            if ui is not None:
                return ui
        return None


# -------------------------------------------------------------- proxy
class VMAuthProxy:
    """Threaded HTTP auth proxy over an AuthConfig — the runnable
    vmauth.  Routes each request through the matched user's url_map,
    injects request/response headers, retries across backends on
    retry_status_codes, and answers 401 (missing/unknown credentials,
    no unauthorized_user section) / 400 (no route)."""

    def __init__(self, config: AuthConfig, host: str = "127.0.0.1"):
        self.config = config
        self.host = host
        self.httpd = None

    def _handle(self, handler) -> None:
        import urllib.error
        import urllib.request

        cfg = self.config
        auth = handler.headers.get("Authorization")
        ui = cfg.get_user([auth] if auth else [])
        if ui is None:
            ui = cfg.unauthorized
        if ui is None:
            handler.send_response(401)
            handler.send_header(
                "WWW-Authenticate", 'Basic realm="Restricted"'
            )
            handler.end_headers()
            handler.wfile.write(b"missing valid auth credentials\n")
            return
        scheme, netloc, path, query, _ = urlsplit(handler.path)
        path = normalize_url(path)
        qargs = parse_qsl(query, keep_blank_values=True)
        qdict: dict[str, list[str]] = {}
        for k, v in qargs:
            qdict.setdefault(k, []).append(v)
        host = handler.headers.get("Host", "")
        hdrs = {k: handler.headers.get_all(k) or [] for k in handler.headers}
        up, hc = ui.get_url_prefix_and_headers(path, host, qdict, hdrs)
        if up is None:
            handler.send_response(400)
            handler.end_headers()
            handler.wfile.write(
                f"missing route for {handler.path!r}\n".encode()
            )
            return
        body = None
        length = int(handler.headers.get("Content-Length") or 0)
        if length:
            body = handler.rfile.read(length)
        retry_codes = set(up.retry_status_codes or [])
        last = None
        for backend in up.backend_urls_in_order():
            target = merge_urls(
                backend, path, qargs,
                up.drop_src_path_prefix_parts, up.merge_query_args,
            )
            req = urllib.request.Request(
                target, data=body, method=handler.command
            )
            for h in hc.request_headers:
                req.add_header(h.name, h.value)
            ct = handler.headers.get("Content-Type")
            if ct:
                req.add_header("Content-Type", ct)
            try:
                resp = urllib.request.urlopen(req, timeout=30)
                code, payload = resp.status, resp.read()
                rheaders = resp.headers
            except urllib.error.HTTPError as e:
                code, payload, rheaders = e.code, e.read(), e.headers
            except Exception as e:  # connection refused etc.
                last = (502, str(e).encode(), None)
                continue
            if code in retry_codes:
                last = (code, payload, rheaders)
                continue
            self._respond(handler, code, payload, rheaders, hc)
            return
        if last is not None:
            code, payload, rheaders = last
            self._respond(handler, code, payload, rheaders, hc)
        else:
            handler.send_response(502)
            handler.end_headers()

    def _respond(self, handler, code, payload, rheaders, hc) -> None:
        handler.send_response(code)
        if rheaders is not None:
            for k, v in rheaders.items():
                if k.lower() in ("transfer-encoding", "connection"):
                    continue
                handler.send_header(k, v)
        for h in hc.response_headers:
            handler.send_header(h.name, h.value)
        handler.end_headers()
        handler.wfile.write(payload)

    def serve(self, port: int = 0) -> int:
        """Start the proxy on a background thread; returns the port."""
        import http.server
        import threading

        proxy = self

        class H(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _do(self):
                proxy._handle(self)

            do_GET = do_POST = do_PUT = do_DELETE = _do

        self.httpd = http.server.ThreadingHTTPServer((self.host, port), H)
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return self.httpd.server_address[1]

    def shutdown(self) -> None:
        if self.httpd:
            self.httpd.shutdown()
