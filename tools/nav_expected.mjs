#!/usr/bin/env node
// Expected-output generator for the exact-build NAVIGATION queries
// (q19/q31/q32/q33/q34) on the sf0.01 events fixture — the independent
// published-algorithm implementation (supercluster_core.mjs, same build the
// 500-point golden differential locks) run on the same 10k points the Spark
// queries index, emitting the rows each query must return. The committed
// outputs become DuckDB oracles via read_csv (see SparkEntry.oracleSql);
// NavGoldenSpec cross-checks Spark against them in CI.
//
// Input CSV (event_id,lng,lat; header; sorted by event_id, ids dense from 0)
// is produced by the exact centesimal formula shared by Spatial.pointsDf and
// pointsSql:
//   lng = (event_id % 36000)/100 - 180
//   lat = ((user_id*9973 + event_id) % 17000)/100 - 85
// Every arithmetic op is IEEE-exact on integer-valued doubles, so the
// coordinates are bit-identical across JS / JVM / DuckDB.
//
// Usage:
//   python3 - <<'EOF'
//   import duckdb
//   duckdb.sql("""COPY (SELECT event_id,
//       (event_id % 36000)/100.0 - 180.0 AS lng,
//       ((user_id*9973 + event_id) % 17000)/100.0 - 85.0 AS lat
//     FROM '/root/testdata/sf0.01/events.parquet' ORDER BY event_id)
//     TO '/tmp/nav_points.csv' (HEADER)""")
//   EOF
//   node tools/nav_expected.mjs /tmp/nav_points.csv src/test/resources/nav_sf001
//
// Emits q18/q19/q31/q32/q33/q34 expected CSVs.
"use strict";

import { readFileSync, writeFileSync, mkdirSync } from "node:fs";
import { build, xLng, childrenOf, expansionZoom } from "./supercluster_core.mjs";

const [csvPath, outDir] = process.argv.slice(2);
if (!csvPath || !outDir) {
  console.error("usage: nav_expected.mjs <points.csv> <outDir>");
  process.exit(1);
}

// graft.cluster.ClusterOptions() defaults — what Spatial.index builds with
// (NOT the 500-pt golden fixture's radius-75 engine.test.ts options)
const OPTS = { radius: 40, extent: 512, minZoom: 0, maxZoom: 16, minPoints: 2 };

const rows = readFileSync(csvPath, "utf8").trim().split("\n").slice(1)
  .map((l) => l.split(","))
  .map(([id, lng, lat]) => [Number(id), Number(lng), Number(lat)]);
rows.forEach(([id], i) => {
  if (id !== i) throw new Error(`event_id not dense at row ${i}: ${id}`);
});
const points = rows.map(([, lng, lat]) => [lng, lat]);
const N = points.length;
console.error(`[nav] ${N} points`);

const levels = build(points, OPTS);
for (let z = 0; z <= 17; z++) {
  console.error(`[nav] level ${z}: ${levels[z].length} records, ` +
    `${levels[z].filter((p) => p.num > 1).length} clusters`);
}

// probe: largest cluster at z3 (point_count desc, id asc — Spatial.largestClusterId)
const largestAt = (z) => levels[z].filter((p) => p.num > 1)
  .sort((a, b) => b.num - a.num || a.id - b.id)[0];
const target3 = largestAt(3);
console.error(`[nav] largest z3 cluster: id=${target3.id} num=${target3.num}`);

// q19: per-zoom level profile (all integers; zoom maxZoom+1 = the leaf level)
{
  const lines = ["zoom,n_records,n_clusters,total_points,max_cluster_size"];
  for (let z = OPTS.minZoom; z <= OPTS.maxZoom + 1; z++) {
    const lvl = levels[z];
    lines.push([z, lvl.length, lvl.filter((p) => p.num > 1).length,
      lvl.reduce((a, p) => a + p.num, 0),
      lvl.reduce((a, p) => Math.max(a, p.num), 0)].join(","));
  }
  writeFileSync(`${outDir}/q19_expected.csv`, lines.join("\n") + "\n");
}

// Coordinate columns: `lng` (clusters: xLng of the f64 centroid — exact
// arithmetic; leaves: the ORIGINAL source lng) and mercator `my` (the raw
// stored y) are BIT-EXACT across JS/JVM — every producing op is IEEE-basic.
// `lat` (yLat: atan∘exp) is NOT emitted: it wobbles by 1 ULP between math
// libraries (measured on this fixture), and the Spark probes project `my`
// for the same reason.
const lngOf = (k) => (k.num > 1 ? xLng(k.x) : points[k.id][0]);

// q18: the FULL level-4 contents (world-bbox getClusters at z4), sorted by id
{
  const lines = ["id,lng,my,point_count,is_cluster"];
  for (const k of levels[4].slice().sort((a, b) => a.id - b.id)) {
    lines.push([k.id, lngOf(k), k.y, k.num, k.num > 1].join(","));
  }
  writeFileSync(`${outDir}/q18_expected.csv`, lines.join("\n") + "\n");
}

// q31: direct children of the largest z3 cluster, sorted by id
{
  const kids = childrenOf(levels, target3.id, N).slice()
    .sort((a, b) => a.id - b.id);
  const lines = ["id,parent_id,point_count,is_cluster,lng,my"];
  for (const k of kids) {
    lines.push([k.id, k.parent, k.num, k.num > 1, lngOf(k), k.y].join(","));
  }
  writeFileSync(`${outDir}/q31_expected.csv`, lines.join("\n") + "\n");
}

// all leaves (id order) of the z3 target — q32 pages [5, 30), q34 pages
// [0, 25). Leaf coords are the original inputs, so the oracles re-derive
// them from the events table; only the ids are committed.
{
  const leaves = [];
  const walk = (cid) => {
    for (const k of childrenOf(levels, cid, N)) {
      if (k.num > 1) walk(k.id);
      else leaves.push(k.id);
    }
  };
  walk(target3.id);
  leaves.sort((a, b) => a - b);
  if (leaves.length !== target3.num) {
    throw new Error(`leaf count ${leaves.length} != cluster num ${target3.num}`);
  }
  writeFileSync(`${outDir}/q32_expected.csv`,
    "row_id\n" + leaves.slice(5, 30).join("\n") + "\n");
  writeFileSync(`${outDir}/q34_expected.csv`,
    "event_id\n" + leaves.slice(0, 25).join("\n") + "\n");
}

// q33: top-5 z2 clusters (point_count desc, id asc), each with expansion
// zoom and its CLUSTER-descendant count; output sorted by cluster_id
{
  const tops = levels[2].filter((p) => p.num > 1)
    .sort((a, b) => b.num - a.num || a.id - b.id).slice(0, 5);
  const out = tops.map((p) => {
    const ez = expansionZoom(levels, p.id, N, OPTS.maxZoom);
    let frontier = [p.id];
    let nDesc = 0;
    while (frontier.length) {
      const next = frontier.flatMap((cid) =>
        childrenOf(levels, cid, N).filter((k) => k.num > 1).map((k) => k.id));
      nDesc += next.length;
      frontier = next;
    }
    return [p.id, p.num, ez, nDesc];
  }).sort((a, b) => a[0] - b[0]);
  writeFileSync(`${outDir}/q33_expected.csv`,
    "cluster_id,point_count,expansion_zoom,n_descendants\n" +
      out.map((r) => r.join(",")).join("\n") + "\n");
}
console.error("[nav] wrote q19/q31/q32/q33/q34 expected files");
