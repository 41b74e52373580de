"""Username-prefix routing — the reference's core "query".

Rule (gateway/gateway.go:253-267): split the username on the FIRST '.'
into (cluster_id, real_username); look the cluster up case-insensitively
(gateway/config.go:28-35).  A "cluster" here is a named catalog: a
directory of parquet tables registered as views (at deployment scale, a
metastore catalog/namespace).

Deliberate deviation: the reference treats an unknown cluster id as a
literal backend address and dials it (config.go:34) — a footgun that
lets clients make the gateway connect anywhere.  This rebuild returns
ERR 1105 for unknown clusters instead (SURVEY.md §4.2).
"""

from __future__ import annotations

from dataclasses import dataclass


class UnknownClusterError(Exception):
    pass


@dataclass
class Route:
    cluster_id: str
    username: str
    sf_dir: str


class Router:
    def __init__(self, clusters: dict[str, str], default: str | None = None):
        """clusters: cluster_id → sf_dir (catalog root); lookups are
        case-insensitive (config.go:31-33)."""
        self.clusters = {k.lower(): v for k, v in clusters.items()}
        self.default = default

    def route(self, username: str) -> Route:
        cluster_id, sep, real_user = username.partition(".")
        if not sep:
            # no prefix → default catalog
            if self.default is None:
                raise UnknownClusterError("no cluster prefix and no default catalog")
            return Route("", username, self.default)
        sf_dir = self.clusters.get(cluster_id.lower())
        if sf_dir is None:
            raise UnknownClusterError(f"unknown cluster {cluster_id!r}")
        return Route(cluster_id, real_user, sf_dir)
