"""RBAC authorization port (vanus_spark/authz.py) vs the reference's
pkg/authorization semantics, including the role-alias quirk."""

from __future__ import annotations

import pytest


def _authz(bindings, ns=None):
    from vanus_spark.authz import Authorizer

    return Authorizer(bindings, ns)


def test_cluster_admin_allows_everything():
    a = _authz([{"user": "root", "role": "clusterAdmin",
                 "resource_kind": "cluster", "resource_id": 0}])
    assert a.authorize("root", "eventbus", 42, "eventbus:delete")
    assert a.authorize("root", "namespace", 1, "namespace:grant")
    assert not a.authorize("other", "eventbus", 42, "eventbus:read")


def test_namespace_roles_escalate_to_owned_resources():
    ns = {("eventbus", 7): 2, ("subscription", 9): 2}
    a = _authz(
        [{"user": "alice", "role": "edit",
          "resource_kind": "namespace", "resource_id": 2},
         {"user": "bob", "role": "view",
          "resource_kind": "namespace", "resource_id": 2}],
        ns,
    )
    # namespace edit: read/write/delete eventbuses in the namespace
    assert a.authorize("alice", "eventbus", 7, "eventbus:read")
    assert a.authorize("alice", "eventbus", 7, "eventbus:delete")
    assert a.authorize("alice", "subscription", 9, "subscription:update")
    # namespace view: get only
    assert a.authorize("bob", "eventbus", 7, "eventbus:get")
    assert not a.authorize("bob", "eventbus", 7, "eventbus:read")
    # a bus in a DIFFERENT namespace is out of reach
    a.resource_namespaces[("eventbus", 8)] = 3
    assert not a.authorize("alice", "eventbus", 8, "eventbus:read")


def test_eventbus_admin_direct_grant_and_delete_gap():
    a = _authz([{"user": "carol", "role": "admin",
                 "resource_kind": "eventbus", "resource_id": 5}])
    assert a.authorize("carol", "eventbus", 5, "eventbus:read")
    assert a.authorize("carol", "eventbus", 5, "eventbus:write")
    assert a.authorize("carol", "eventbus", 5, "eventbus:update")
    # eventbus:delete is namespace-admin/edit ONLY in the reference
    assert not a.authorize("carol", "eventbus", 5, "eventbus:delete")
    assert not a.authorize("carol", "eventbus", 6, "eventbus:read")


def test_reference_role_alias_quirk():
    """role.go declares eventbus edit/view/read/write as aliases of
    the ADMIN key, so a direct non-admin binding on an eventbus grants
    nothing — reproduced deliberately."""
    a = _authz([{"user": "dave", "role": "read",
                 "resource_kind": "eventbus", "resource_id": 3}])
    assert not a.authorize("dave", "eventbus", 3, "eventbus:read")
    assert not a.authorize("dave", "eventbus", 3, "eventbus:get")


def test_token_authentication_roundtrip():
    from vanus_spark.authz import TokenAuthenticator

    t = TokenAuthenticator({"tok1": "alice"})
    assert t.authenticate("tok1") == "alice"
    t.create_token("tok2", "bob")
    assert t.authenticate("tok2") == "bob"
    t.revoke_token("tok1")
    with pytest.raises(PermissionError):
        t.authenticate("tok1")


def test_batch_matches_policy_evaluator(spark):
    """authorize_requests (joins) == Authorizer (loop) on a dense grid
    of user x kind x resource x action."""
    from pyspark.sql import functions as F

    from vanus_spark.authz import Authorizer, authorize_requests

    bindings = [
        {"user": "root", "role": "clusterAdmin",
         "resource_kind": "cluster", "resource_id": 0},
        {"user": "alice", "role": "edit",
         "resource_kind": "namespace", "resource_id": 1},
        {"user": "bob", "role": "admin",
         "resource_kind": "eventbus", "resource_id": 4},
        {"user": "bob", "role": "view",
         "resource_kind": "namespace", "resource_id": 2},
        {"user": "carol", "role": "read",
         "resource_kind": "eventbus", "resource_id": 4},
    ]
    ns_map = {("eventbus", 3): 1, ("eventbus", 4): 2,
              ("subscription", 5): 1}
    pol = Authorizer(bindings, ns_map)

    users = ["root", "alice", "bob", "carol", "nobody"]
    targets = [("eventbus", 3), ("eventbus", 4), ("subscription", 5),
               ("namespace", 1), ("namespace", 2)]
    actions = ["eventbus:read", "eventbus:delete", "eventbus:get",
               "subscription:update", "namespace:get", "namespace:grant"]
    reqs = [
        (i, u, k, rid, act)
        for i, (u, (k, rid), act) in enumerate(
            (u, t, a) for u in users for t in targets for a in actions
        )
    ]
    req_df = spark.createDataFrame(
        reqs,
        "req_id long, user string, resource_kind string, "
        "resource_id long, action string",
    )
    roles_df = spark.createDataFrame(
        [(b["user"], b["role"], b["resource_kind"], b["resource_id"])
         for b in bindings],
        "user string, role string, resource_kind string, resource_id long",
    )
    res_df = spark.createDataFrame(
        [(k, rid, ns) for (k, rid), ns in ns_map.items()],
        "resource_kind string, resource_id long, namespace_id long",
    )
    got = {
        r.req_id: r.allowed
        for r in authorize_requests(req_df, roles_df, res_df).collect()
    }
    for rid_, u, k, rid, act in reqs:
        exp = pol.authorize(u, k, rid, act)
        assert got[rid_] == exp, (u, k, rid, act, got[rid_], exp)
