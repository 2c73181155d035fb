// Shared core for the golden-fixture generators: an independent,
// self-contained implementation of the published Supercluster greedy
// algorithm (MIT, Mapbox; semantics also mirrored by the reference engine at
// reference arrow-cluster-engine.ts:354-416).
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
// positions, so outputs derived from this build transitively encode
// Supercluster's output.
//
// Consumers: golden_supercluster.mjs (500-pt LCG differential fixture),
// nav_expected.mjs (sf0.01 events navigation expecteds).
"use strict";

import { KDBushOrder } from "./kdbush_order.mjs";

// --- LCG(16807) mod 2^31-1, seed 42 (tests/test-utils.ts:51-65) ---
export function makePoints(n) {
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
export const lngX = (lng) => lng / 360 + 0.5;
export function latY(lat) {
  const sin = Math.sin((lat * Math.PI) / 180);
  const y = 0.5 - (0.25 * Math.log((1 + sin) / (1 - sin))) / Math.PI;
  return y < 0 ? 0 : y > 1 ? 1 : y;
}
export const xLng = (x) => (x - 0.5) * 360;
export function yLat(y) {
  const y2 = ((180 - y * 360) * Math.PI) / 180;
  return (360 * Math.atan(Math.exp(y2))) / Math.PI - 90;
}
export const fround = Math.fround;

// --- greedy hierarchy build ---
// record: { x, y, processedAt, id, parent, num }  (x/y raw f64; query space f32)
export function build(points, opts) {
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
export const originZoom = (id, total) => (id - total) % 32;

export function childrenOf(levels, clusterId, total) {
  const oz = originZoom(clusterId, total);
  return levels[oz].filter((p) => p.parent === clusterId);
}

export function expansionZoom(levels, clusterId, total, maxZoom) {
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
export function dfsLeaves(levels, clusterId, total) {
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
export function buildTrees(levels, opts) {
  const trees = {};
  for (let z = opts.minZoom; z <= opts.maxZoom + 1; z++) {
    const lvl = levels[z];
    const tree = new KDBushOrder(lvl.length, 64);
    for (const p of lvl) tree.add(p.x, p.y); // Float32Array quantizes on store
    trees[z] = tree.finish();
  }
  return trees;
}

export function childrenOfInsertion(levels, trees, clusterId, total, opts) {
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
export function dfsLeavesInsertion(levels, trees, clusterId, total, opts) {
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
