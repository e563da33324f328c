"""ASN enrichment (SURVEY.md M7, J5).

The reference resolves each IP with a live ipwhois lookup one at a time
(reference ``crawler/asn.py:50-58``); here enrichment is a longest-prefix
match against the ``asn_db`` table (cidr → asn metadata), run as a
``map_batches`` ACTOR pool: the prefix table is loaded and indexed once per
actor in ``__init__``, lookups are cached per actor (the reference's
get_or_create dim cache, T5).

Dim stubbing (J5): :func:`distinct_ips` unions the article post ips and the
push ips into the distinct set to enrich — the analog of the reference
creating NULL-field IpAsn stubs at crawl time (crawler/article.py:183-195,
:236-247) that the asn module later fills.
"""

from __future__ import annotations

import ipaddress
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


class AsnEnrich:
    """map_batches actor: adds asn columns for an ``ip`` column."""

    def __init__(self, asn_db_path: str):
        tbl = pq.read_table(asn_db_path)
        self.nets: list[tuple[ipaddress.IPv4Network, dict]] = []
        for row in tbl.to_pylist():
            net = ipaddress.ip_network(row["cidr"])
            self.nets.append((net, row))
        # longest prefix first
        self.nets.sort(key=lambda t: -t[0].prefixlen)
        self._cache: dict[str, dict | None] = {}

    def lookup(self, ip: str) -> dict | None:
        if ip in self._cache:
            return self._cache[ip]
        hit = None
        try:
            addr = ipaddress.ip_address(ip)
            for net, row in self.nets:
                if addr in net:
                    hit = row
                    break
        except ValueError:
            hit = None
        self._cache[ip] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        ips = batch["ip"].to_pylist()
        cols = {k: [] for k in ("asn", "asn_cidr", "asn_country_code",
                                "asn_registry", "asn_description", "asn_date")}
        for ip in ips:
            hit = self.lookup(ip) if ip else None
            cols["asn"].append(hit["asn"] if hit else None)
            cols["asn_cidr"].append(hit["cidr"] if hit else None)
            cols["asn_country_code"].append(hit["asn_country_code"] if hit else None)
            cols["asn_registry"].append(hit["asn_registry"] if hit else None)
            cols["asn_description"].append(hit["asn_description"] if hit else None)
            cols["asn_date"].append(hit["asn_date"] if hit else None)
        out = batch
        for name in ("asn", "asn_cidr", "asn_country_code", "asn_registry", "asn_description"):
            out = out.append_column(name, pa.array(cols[name], pa.string()))
        return out.append_column("asn_date", pa.array(cols["asn_date"], pa.timestamp("us")))


def distinct_ips(articles: "rd.Dataset", pushes: "rd.Dataset") -> "rd.Dataset":
    """Distinct ips over article post ips ∪ push ips (J5/A5)."""
    a = articles.map_batches(
        lambda t: pa.table({"ip": t["ip"]}), batch_format="pyarrow")
    p = pushes.map_batches(
        lambda t: pa.table({"ip": t["push_ip"]}), batch_format="pyarrow")
    u = a.union(p)
    u = u.map_batches(lambda t: t.filter(pa.compute.is_valid(t["ip"])),
                      batch_format="pyarrow")
    # distributed distinct (Dataset.unique() returns a driver-side list)
    return u.groupby("ip").count().select_columns(["ip"])


def enrich_ips(ips: "rd.Dataset", asn_db_path: str, concurrency: int = 2) -> "rd.Dataset":
    """The ip_asn dimension table (ip + asn fields), IpAsn analog."""
    return ips.map_batches(
        AsnEnrich,
        fn_constructor_kwargs={"asn_db_path": asn_db_path},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
