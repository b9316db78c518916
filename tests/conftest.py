from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


def true_components(pairs_a, pairs_b):
    """Exact connected components (BFS) over the edge list — the ground
    truth the label maps are checked against, so cross-component merges
    (two real clusters sharing a label) are detectable."""
    adj: dict = {}
    for a, b in zip(pairs_a, pairs_b):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, comp = set(), {}
    for start in adj:
        if start in seen:
            continue
        stack, members = [start], set()
        while stack:
            u = stack.pop()
            if u in members:
                continue
            members.add(u)
            stack.extend(adj[u] - members)
        seen |= members
        root = min(members)
        for m in members:
            comp[m] = root
    return comp


def check_cluster_labels(pairs, clusters, id_col):
    """Label map == exact BFS components; singletons self-labeled; one row
    per id."""
    lbl = dict(
        zip(
            clusters.column(id_col).to_pylist(),
            clusters.column("cluster_id").to_pylist(),
        )
    )
    comp = true_components(
        pairs.column("a").to_pylist(), pairs.column("b").to_pylist()
    )
    for m, root in comp.items():
        assert lbl[m] == root, (m, lbl[m], root)
    assert all(lbl[s] == s for s in set(lbl) - set(comp))
    assert clusters.num_rows == len(lbl)
    return comp
