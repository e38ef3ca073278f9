"""Controller-style metadata catalog (vanus_spark/catalog.py)."""

from __future__ import annotations

import pytest


def _cat(tmp_path, name="cat.json"):
    from vanus_spark.catalog import Catalog
    from vanus_spark.snowflake import Snowflake

    t = {"ms": 0}

    def clock():
        t["ms"] += 10
        return t["ms"]

    return Catalog(
        str(tmp_path / name),
        id_gen=Snowflake(machine_id=16, start_time_ms=0, clock_ms=clock),
    )


def test_crud_uniqueness_and_referential_integrity(tmp_path):
    from vanus_spark.catalog import (
        ResourceExistsError,
        ResourceInUseError,
        ResourceNotFoundError,
    )

    c = _cat(tmp_path)
    ns = c.create_namespace("default")
    with pytest.raises(ResourceExistsError):
        c.create_namespace("default")
    with pytest.raises(ValueError):
        c.create_namespace("")

    eb = c.create_eventbus(ns["id"], "orders", log_number=8)
    with pytest.raises(ResourceExistsError):
        c.create_eventbus(ns["id"], "orders")
    ns2 = c.create_namespace("other")
    c.create_eventbus(ns2["id"], "orders")  # same name, other ns: fine
    with pytest.raises(ResourceNotFoundError):
        c.create_eventbus(999999, "x")

    sub = c.create_subscription(ns["id"], eb["id"], {"filters": []})
    assert [b["name"] for b in c.list_eventbuses(ns["id"])] == ["orders"]
    assert c.list_subscriptions(eb["id"])[0]["id"] == sub["id"]

    with pytest.raises(ResourceInUseError):
        c.delete_eventbus(eb["id"])
    with pytest.raises(ResourceInUseError):
        c.delete_namespace(ns["id"])
    c.delete_subscription(sub["id"])
    c.delete_eventbus(eb["id"])
    c.delete_namespace(ns["id"])
    assert [n["name"] for n in c.list_namespaces()] == ["other"]


def test_persistence_and_concurrent_writer_fence(tmp_path):
    from vanus_spark.catalog import Catalog, CatalogConcurrencyError

    c1 = _cat(tmp_path)
    ns = c1.create_namespace("default")
    # reopening sees the committed state
    c2 = Catalog(c1.path)
    assert c2.get_namespace(ns["id"])["name"] == "default"
    # a stale writer is fenced
    c1.create_namespace("n2")
    with pytest.raises(CatalogConcurrencyError):
        c2.create_namespace("n3")
    c2.refresh()
    c2.create_namespace("n3")
    assert len(c2.list_namespaces()) == 3


def test_authz_integration_via_catalog_escalation(tmp_path):
    """The catalog supplies the eventbus->namespace map; a namespace
    edit role can create/read buses in ITS namespace only, and
    namespace creation is clusterAdmin-only (no role grants
    namespace:create in the reference's table)."""
    from vanus_spark.authz import Authorizer

    c = _cat(tmp_path)
    ns_a = c.create_namespace("team-a")
    ns_b = c.create_namespace("team-b")
    eb_a = c.create_eventbus(ns_a["id"], "logs")
    eb_b = c.create_eventbus(ns_b["id"], "logs")

    az = Authorizer(
        [
            {"user": "root", "role": "clusterAdmin",
             "resource_kind": "cluster", "resource_id": 0},
            {"user": "alice", "role": "edit",
             "resource_kind": "namespace", "resource_id": ns_a["id"]},
        ]
    )
    c.guard(az, "alice", "eventbus", eb_a["id"], "eventbus:read")
    with pytest.raises(PermissionError):
        c.guard(az, "alice", "eventbus", eb_b["id"], "eventbus:read")
    # namespace:create has no role-table entry -> clusterAdmin only
    c.guard(az, "root", "namespace", 0, "namespace:create")
    with pytest.raises(PermissionError):
        c.guard(az, "alice", "namespace", 0, "namespace:create")


def test_users_tokens_roles_lifecycle(tmp_path):
    from vanus_spark.catalog import (
        ResourceExistsError,
        ResourceInUseError,
        ResourceNotFoundError,
    )

    c = _cat(tmp_path, "ut.json")
    c.create_user("alice")
    with pytest.raises(ResourceExistsError):
        c.create_user("alice")
    with pytest.raises(ResourceNotFoundError):
        c.create_token("bob")
    tok = c.create_token("alice")
    assert c.list_tokens("alice")[0]["token"] == tok["token"]

    # authn from the stored tokens
    auth = c.authenticator()
    assert auth.authenticate(tok["token"]) == "alice"

    ns = c.create_namespace("default")
    c.grant_role("alice", "edit", "namespace", ns["id"])
    with pytest.raises(ValueError):
        c.grant_role("alice", "superuser", "namespace", ns["id"])
    eb = c.create_eventbus(ns["id"], "logs")
    az = c.authorizer()
    assert az.authorize("alice", "eventbus", eb["id"], "eventbus:read")

    c.revoke_role("alice", "edit", "namespace", ns["id"])
    with pytest.raises(ResourceNotFoundError):
        c.revoke_role("alice", "edit", "namespace", ns["id"])
    assert not c.authorizer().authorize(
        "alice", "eventbus", eb["id"], "eventbus:read"
    )

    with pytest.raises(ResourceInUseError):
        c.delete_user("alice")  # has a live token
    c.delete_token(tok["token"])
    c.delete_user("alice")
    assert c.list_users() == []


def test_subscription_lifecycle_phases(tmp_path):
    """Phase rules mirrored from controller.go:145-361: update/reset
    require stopped; disable errors when already stopped (unless
    declarative); resume requires stopped; offsets survive resume."""
    from vanus_spark.catalog import ResourceCanNotOpError

    c = _cat(tmp_path)
    ns = c.create_namespace("default")
    eb = c.create_eventbus(ns["id"], "demo")
    sub = c.create_subscription(ns["id"], eb["id"], {"filters": []})
    assert sub["phase"] == "created"

    # wrong-phase guards while running
    with pytest.raises(ResourceCanNotOpError):
        c.update_subscription(sub["id"], {"sink": "http://x"})
    with pytest.raises(ResourceCanNotOpError):
        c.reset_subscription_offsets(sub["id"], {0: 5})
    with pytest.raises(ResourceCanNotOpError):
        c.resume_subscription(sub["id"])

    d = c.disable_subscription(sub["id"])
    assert d["phase"] == "stopped"
    with pytest.raises(ResourceCanNotOpError):
        c.disable_subscription(sub["id"])
    # declarative disable of a stopped subscription is a no-op
    assert c.disable_subscription(sub["id"], declaratively=True)["phase"] == "stopped"

    # update: eventbus immutable, no-op refused, spec merged
    with pytest.raises(ValueError):
        c.update_subscription(sub["id"], {"eventbus_id": eb["id"] + 1})
    u = c.update_subscription(sub["id"], {"sink": "http://hook"})
    assert u["spec"]["sink"] == "http://hook"
    with pytest.raises(ValueError):
        c.update_subscription(sub["id"], {"sink": "http://hook"})  # no change

    r = c.reset_subscription_offsets(sub["id"], {0: 5, 1: 7})
    assert r["offsets"] == {"0": 5, "1": 7}

    res = c.resume_subscription(sub["id"])
    assert res["phase"] == "created"
    assert res["offsets"] == {"0": 5, "1": 7}  # offsets intact across resume
    assert c.subscription_is_active(sub["id"])

    # create-disabled lands straight in stopped (controller.go:206-209)
    sub2 = c.create_subscription(ns["id"], eb["id"], {}, disable=True)
    assert sub2["phase"] == "stopped"
    assert not c.subscription_is_active(sub2["id"])

    # persistence: a fresh catalog instance sees the same lifecycle state
    from vanus_spark.catalog import Catalog

    c2 = Catalog(c.path)
    assert c2.get_subscription(sub["id"])["phase"] == "created"
    assert c2.get_subscription(sub2["id"])["phase"] == "stopped"
