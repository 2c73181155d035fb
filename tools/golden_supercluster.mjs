#!/usr/bin/env node
// Golden-fixture generator for the 500-point LCG-42 differential fixture the
// reference's own tests use (tests/test-utils.ts:51-65, options per
// engine.test.ts:12). All algorithmic machinery lives in
// supercluster_core.mjs (shared with nav_expected.mjs); see the precision
// contract documented there.
//
// Usage: node tools/golden_supercluster.mjs > src/test/resources/golden_supercluster_500.tsv
"use strict";

import {
  makePoints, build, xLng, yLat,
  expansionZoom, dfsLeaves, buildTrees, childrenOfInsertion, dfsLeavesInsertion,
} from "./supercluster_core.mjs";

const N = 500;
const OPTS = { radius: 75, extent: 512, minZoom: 0, maxZoom: 16, minPoints: 2 };

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
