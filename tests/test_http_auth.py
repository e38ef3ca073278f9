"""Gateway authn/authz on the HTTP ingest front door."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest


def _post(url, body: dict, token: str | None = None):
    headers = {"Content-Type": "application/cloudevents+json"}
    if token is not None:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), headers=headers, method="POST"
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


EVENT = {"specversion": "1.0", "id": "e1", "source": "/t", "type": "demo"}


def test_gateway_publish_auth(tmp_path):
    from vanus_spark.catalog import Catalog, publish_guard
    from vanus_spark.sources.http_ingest import CloudEventsReceiver

    cat = Catalog(str(tmp_path / "cat.json"))
    ns = cat.create_namespace("default")
    eb = cat.create_eventbus(ns["id"], "orders")
    cat.create_user("alice")
    cat.create_user("mallory")
    tok_a = cat.create_token("alice")["token"]
    tok_m = cat.create_token("mallory")["token"]
    cat.grant_role("alice", "edit", "namespace", ns["id"])

    with CloudEventsReceiver(
        str(tmp_path / "spool"), guard=publish_guard(cat, "default")
    ) as r:
        url = f"{r.url}/gateway/v1/eventbus/orders/events"
        assert _post(url, EVENT)[0] == 401                  # no token
        assert _post(url, EVENT, "bogus")[0] == 401         # unknown token
        assert _post(url, EVENT, tok_m)[0] == 403           # no write role
        code, body = _post(url, EVENT, tok_a)               # authorized
        assert code == 200 and body["eventbus"] == "orders"
        # unknown bus name -> 403 even with a valid token
        other = f"{r.url}/gateway/v1/eventbus/nope/events"
        assert _post(other, EVENT, tok_a)[0] == 403
        # revocation is immediate
        cat.delete_token(tok_a)
        assert _post(url, EVENT, tok_a)[0] == 401
