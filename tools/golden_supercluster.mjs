#!/usr/bin/env node
// Golden-fixture generator: an independent, self-contained implementation of
// the published Supercluster greedy algorithm (MIT, Mapbox; semantics also
// mirrored by the reference engine at
// reference arrow-cluster-engine.ts:354-416) run on the LCG-seed-42 fixture
// the reference's differential tests use (tests/test-utils.ts:51-65, options
// per engine.test.ts:12).
//
// Precision contract mirrors the reference engine (and graft.GreedyCore):
//   - base coords f32-quantized (fround ∘ lngX / latY)
//   - neighbor distances measured against f32-quantized coords with a raw
//     double query point, boundary-inclusive (<= r²) — the same numbers a
//     Float32Array-backed KDBush produces
//   - cluster centroids accumulated and stored in raw f64
//   - neighbor iteration in index-ascending order (affects only the float
//     summation order; absorbed by the next level's f32 quantization)
// The reference's own test suite (engine.test.ts:25-83) proves this contract
// matches original Supercluster with exact per-zoom counts and 1e-4
// positions, so these goldens transitively encode Supercluster's output.
//
// Usage: node tools/golden_supercluster.mjs > src/test/resources/golden_supercluster_500.tsv
"use strict";

import { KDBushOrder } from "./kdbush_order.mjs";

const N = 500;
const OPTS = { radius: 75, extent: 512, minZoom: 0, maxZoom: 16, minPoints: 2 };

// --- fixture: LCG(16807) mod 2^31-1, seed 42 (tests/test-utils.ts:51-65) ---
function makePoints(n) {
  let seed = 42;
  const rand = () => {
    seed = (seed * 16807) % 2147483647; // < 2^53, exact in a double
    return seed / 2147483647;
  };
  const pts = [];
  for (let i = 0; i < n; i++) {
    const lng = rand() * 360 - 180;
    const lat = rand() * 170 - 85;
    pts.push([lng, lat]);
  }
  return pts;
}

// --- web-mercator unit square (supercluster's projection) ---
const lngX = (lng) => lng / 360 + 0.5;
function latY(lat) {
  const sin = Math.sin((lat * Math.PI) / 180);
  const y = 0.5 - (0.25 * Math.log((1 + sin) / (1 - sin))) / Math.PI;
  return y < 0 ? 0 : y > 1 ? 1 : y;
}
const xLng = (x) => (x - 0.5) * 360;
function yLat(y) {
  const y2 = ((180 - y * 360) * Math.PI) / 180;
  return (360 * Math.atan(Math.exp(y2))) / Math.PI - 90;
}
const fround = Math.fround;

// --- greedy hierarchy build ---
// record: { x, y, processedAt, id, parent, num }  (x/y raw f64; query space f32)
function build(points, opts) {
  const total = points.length;
  let cur = points.map(([lng, lat], i) => ({
    x: fround(lngX(lng)),
    y: fround(latY(lat)),
    processedAt: Infinity,
    id: i,
    parent: -1,
    num: 1,
  }));
  const levels = {};
  levels[opts.maxZoom + 1] = cur;

  for (let z = opts.maxZoom; z >= opts.minZoom; z--) {
    const r = opts.radius / (opts.extent * Math.pow(2, z));
    const r2 = r * r;
    const qx = cur.map((p) => fround(p.x));
    const qy = cur.map((p) => fround(p.y));
    const within = (x, y) => {
      const out = [];
      for (let j = 0; j < cur.length; j++) {
        const dx = qx[j] - x;
        const dy = qy[j] - y;
        if (dx * dx + dy * dy <= r2) out.push(j); // index-ascending
      }
      return out;
    };

    const next = [];
    for (let i = 0; i < cur.length; i++) {
      const p = cur[i];
      if (p.processedAt <= z) continue;
      p.processedAt = z;

      const neighbors = within(p.x, p.y);
      const numOrigin = p.num;
      let num = numOrigin;
      for (const j of neighbors) {
        if (cur[j].processedAt > z) num += cur[j].num;
      }

      if (num > numOrigin && num >= opts.minPoints) {
        let wx = p.x * numOrigin;
        let wy = p.y * numOrigin;
        const id = (i << 5) + (z + 1) + total;
        for (const j of neighbors) {
          const q = cur[j];
          if (q.processedAt <= z) continue;
          q.processedAt = z;
          wx += q.x * q.num;
          wy += q.y * q.num;
          q.parent = id;
        }
        p.parent = id;
        next.push({
          x: wx / num, y: wy / num,
          processedAt: Infinity, id, parent: -1, num,
        });
      } else {
        next.push({ ...p });
        if (num > 1) {
          for (const j of neighbors) {
            const q = cur[j];
            if (q.processedAt <= z) continue;
            q.processedAt = z;
            next.push({ ...q });
          }
        }
      }
    }
    levels[z] = next;
    cur = next;
  }
  return levels;
}

// --- navigation over the built levels ---
const originZoom = (id, total) => (id - total) % 32;

function childrenOf(levels, clusterId, total) {
  const oz = originZoom(clusterId, total);
  return levels[oz].filter((p) => p.parent === clusterId);
}

function expansionZoom(levels, clusterId, total, maxZoom) {
  let cid = clusterId;
  let ez = originZoom(cid, total) - 1;
  for (;;) {
    if (ez > maxZoom) break;
    const kids = childrenOf(levels, cid, total);
    ez++;
    if (kids.length !== 1) break;
    if (kids[0].num > 1) cid = kids[0].id;
    else break;
  }
  return ez;
}

// DFS leaf order with children visited in ascending-id order (graft's
// default deterministic child order — membership identical to the
// reference's, order simpler)
function dfsLeaves(levels, clusterId, total) {
  const out = [];
  const walk = (cid) => {
    const kids = childrenOf(levels, cid, total).slice()
      .sort((a, b) => a.id - b.id);
    for (const k of kids) {
      if (k.num > 1) walk(k.id);
      else out.push(k.id);
    }
  };
  walk(clusterId);
  return out;
}

// --- the reference's OWN child-visit order (arrow-cluster-engine.ts
// _getChildIndices:270-302): children come back in kdbush within()
// traversal order over the child level's tree (one KDBush per zoom,
// nodeSize 64, Float32Array coords — _createTree:418-425), queried at the
// origin record's coords with r = radius/(extent·2^(originZoom-1)) ---
function buildTrees(levels, opts) {
  const trees = {};
  for (let z = opts.minZoom; z <= opts.maxZoom + 1; z++) {
    const lvl = levels[z];
    const tree = new KDBushOrder(lvl.length, 64);
    for (const p of lvl) tree.add(p.x, p.y); // Float32Array quantizes on store
    trees[z] = tree.finish();
  }
  return trees;
}

function childrenOfInsertion(levels, trees, clusterId, total, opts) {
  const oz = originZoom(clusterId, total);
  const originId = (clusterId - total) >> 5;
  const lvl = levels[oz];
  const origin = lvl[originId];
  const r = opts.radius / (opts.extent * Math.pow(2, oz - 1));
  return trees[oz]
    .within(origin.x, origin.y, r)
    .filter((nid) => lvl[nid].parent === clusterId)
    .map((nid) => lvl[nid]);
}

// DFS leaf order with the reference's child-visit order — what
// getLeaves(insertionOrder = true) must reproduce page-for-page
function dfsLeavesInsertion(levels, trees, clusterId, total, opts) {
  const out = [];
  const walk = (cid) => {
    for (const k of childrenOfInsertion(levels, trees, cid, total, opts)) {
      if (k.num > 1) walk(k.id);
      else out.push(k.id);
    }
  };
  walk(clusterId);
  return out;
}

// --- emit golden TSV ---
const points = makePoints(N);
const levels = build(points, OPTS);
const lines = [];
lines.push(`# supercluster golden: n=${N} radius=${OPTS.radius} extent=${OPTS.extent} ` +
  `minZoom=${OPTS.minZoom} maxZoom=${OPTS.maxZoom} minPoints=${OPTS.minPoints} lcgSeed=42`);

for (let z = OPTS.minZoom; z <= OPTS.maxZoom; z++) {
  const lvl = levels[z];
  const nClusters = lvl.filter((p) => p.num > 1).length;
  lines.push(`level\t${z}\t${lvl.length}\t${nClusters}`);
  const counts = lvl.map((p) => p.num).sort((a, b) => a - b);
  lines.push(`counts\t${z}\t${counts.join(",")}`);
  const ids = lvl.map((p) => p.id).sort((a, b) => a - b);
  lines.push(`ids\t${z}\t${ids.join(",")}`);
  // positions: clusters inverse-project the centroid; leaves report the
  // ORIGINAL source coords (reference getClusters singleton fast path)
  const pos = lvl.map((p) =>
    p.num > 1 ? [xLng(p.x), yLat(p.y)] : points[p.id],
  ).sort((a, b) => a[0] - b[0] || a[1] - b[1]);
  lines.push(`pos\t${z}\t${pos.map(([lng, lat]) => `${lng}:${lat}`).join(";")}`);
}

// expansion zooms for every cluster at zoom 2 (engine.test.ts:103-131)
for (const p of levels[2].filter((p) => p.num > 1)) {
  lines.push(`expansion\t${p.id}\t${expansionZoom(levels, p.id, N, OPTS.maxZoom)}`);
}

// DFS leaf sequences for the 3 largest clusters at zoom 3 and the largest
// at zoom 1 (deep recursion case)
const probes = levels[3].filter((p) => p.num > 1)
  .sort((a, b) => b.num - a.num || a.id - b.id).slice(0, 3)
  .concat(levels[1].filter((p) => p.num > 1)
    .sort((a, b) => b.num - a.num || a.id - b.id).slice(0, 1));
const trees = buildTrees(levels, OPTS);
for (const p of probes) {
  lines.push(`leafdfs\t${p.id}\t${dfsLeaves(levels, p.id, N).join(",")}`);
  lines.push(`leafdfs_ins\t${p.id}\t${dfsLeavesInsertion(levels, trees, p.id, N, OPTS).join(",")}`);
  // direct children in the reference's child-visit order (getChildren parity)
  lines.push(`children_ins\t${p.id}\t${childrenOfInsertion(levels, trees, p.id, N, OPTS)
    .map((k) => k.id).join(",")}`);
}

process.stdout.write(lines.join("\n") + "\n");
