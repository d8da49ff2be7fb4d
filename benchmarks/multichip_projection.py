"""Config-5 stand-in: projected slab scaling from measured ingredients.

One physical chip exists in this environment, so multi-chip wall-clock
cannot be measured; this is an arithmetic MODEL, clearly labeled, built
ONLY from round-5 measured quantities:

* per-stage single-chip times (stage_budget_big.py, iters=20):
    z(dif) / y / x fwd+inv pair ms at 768³ and 1024³ (see table below);
  1536³/2048³ rows scale the 1024³ stage times by (N/1024)³ at constant
  GB/s (the stages are bandwidth-bound; zdif is not gated at r=12/16 so
  the z stage uses the factored z-pack path — same ~470 GB/s class).
* the self-RDMA DMA-engine ceiling: 230 GB/s per chip (round-4
  dma_copy_onchip, chunking refuted at this ceiling) — an upper bound on
  what one chip can PUSH, regardless of fabric.
* ICI assumption (stated, not measured): v5e 2D torus, 45 GB/s/link
  usable each direction, 4 links/chip → a ring all-to-all sustains
  ~90 GB/s/chip bidirectional payload.  We model a2a chip throughput as
  min(90 GB/s, 230 GB/s) = 90 GB/s and give a DCN-degraded 25 GB/s
  column for cross-host slabs.
* HBM: 15.75 GiB usable/chip (the AOT-ledger capacity constant).

Slab-P packed roundtrip model:
    t_local = (t_zy + t_x) / P                       [both shard 1/P]
    payload/chip/direction = pair_bytes·(P−1)/P²     [a2a send volume]
    t_comm  = 2 · payload / BW                       [fwd + inv each]
    serial  = t_local + t_comm
    overlap = t_local + max(0, t_comm − t_x/P)       [rdma megakernel
              overlaps the transpose with the x-stage matmuls]

Usage: python benchmarks/multichip_projection.py   (pure arithmetic)
"""

import json

GIB = 1024 ** 3

# measured single-chip fwd+inv pair ms (stage_budget_big, round 5)
STAGES = {
    768: {"zy": 16.3 + 15.2, "x": 26.2},
    1024: {"zy": 37.4 + 31.9, "x": 61.8},
}
# bandwidth-scaled frontier rows (same GB/s class as 1024)
for N in (1536, 2048):
    s = (N / 1024) ** 3
    STAGES[N] = {"zy": STAGES[1024]["zy"] * s, "x": STAGES[1024]["x"] * s,
                 "scaled": True}

BW_ICI = 90e9      # modeled: 2 usable 45 GB/s bidirectional links per chip
BW_DCN = 25e9      # cross-host degradation column
HBM = 15.75 * GIB


def project(N, P, bw):
    pair_bytes = N * N * (N // 2) * 2 * 4          # packed planar pair
    t_local = (STAGES[N]["zy"] + STAGES[N]["x"]) / P
    payload = pair_bytes * (P - 1) / (P * P)
    t_comm = 2 * payload / bw * 1e3
    tx = STAGES[N]["x"] / P
    serial = t_local + t_comm
    overlap = t_local + max(0.0, t_comm - tx)
    # resident roundtrip working set per chip: input shard + 2 pair shards
    ws = (N ** 3 * 4 + 2 * pair_bytes) / P
    return {"N": N, "P": P, "t_local_ms": round(t_local, 1),
            "t_comm_ms": round(t_comm, 1),
            "serial_ms": round(serial, 1), "overlap_ms": round(overlap, 1),
            "hbm_gib_per_chip": round(ws / GIB, 2),
            "fits": ws < HBM * 0.85}


def main():
    print(f"{'N':>5} {'P':>2} {'local':>7} {'comm':>7} {'serial':>7} "
          f"{'overlap':>7} {'GiB/chip':>8} fits")
    rows = []
    for N in (768, 1024, 1536, 2048):
        for P in (2, 4, 8):
            r = project(N, P, BW_ICI)
            rows.append(r)
            print(f"{N:>5} {P:>2} {r['t_local_ms']:>7} {r['t_comm_ms']:>7} "
                  f"{r['serial_ms']:>7} {r['overlap_ms']:>7} "
                  f"{r['hbm_gib_per_chip']:>8} {r['fits']}"
                  + ("  [stage times BW-scaled]" if STAGES[N].get("scaled")
                     else ""))
    # DCN column for the 1024 P=8 case
    d = project(1024, 8, BW_DCN)
    print("DCN 25 GB/s example:", json.dumps(d))
    print(json.dumps({"model": "slab", "bw_ici_assumed_GBps": 90,
                      "rows": rows}))


if __name__ == "__main__":
    main()
