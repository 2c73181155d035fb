// Order-exact re-derivation of the published kdbush v4 flat static 2-D
// index (mourner/kdbush, ISC license — the reference engine's tree:
// arrow-cluster-engine.ts:418-425 builds one per zoom with nodeSize 64 and
// Float32Array coords). Re-implemented from the published algorithm
// (Floyd-Rivest select around the midpoint, alternating axes, leaf nodes of
// <= nodeSize entries scanned linearly; within() walks mid, then the right
// half, then the left half via an explicit LIFO stack). Only the pieces the
// golden generator needs are kept: add/finish/within.
//
// The point is ORDER, not membership: _getChildIndices
// (arrow-cluster-engine.ts:270-302) visits a cluster's children in the order
// within() returns them, which is what graft's `insertionOrder` leaf
// pagination must reproduce (graft.cluster.KdBushOrder is the Scala twin of
// this file; GoldenDifferentialSpec ties the two together bit-for-bit).
"use strict";

export class KDBushOrder {
  constructor(numItems, nodeSize = 64) {
    this.numItems = numItems;
    this.nodeSize = nodeSize;
    this.ids = new Uint32Array(numItems);
    this.coords = new Float32Array(numItems * 2);
    this._pos = 0;
  }

  add(x, y) {
    const index = this._pos >> 1;
    this.ids[index] = index;
    this.coords[this._pos++] = x;
    this.coords[this._pos++] = y;
    return index;
  }

  finish() {
    if (this._pos >> 1 !== this.numItems)
      throw new Error(`added ${this._pos >> 1} items, expected ${this.numItems}`);
    sort(this.ids, this.coords, this.nodeSize, 0, this.numItems - 1, 0);
    return this;
  }

  /** All ids within distance r of (qx, qy), in kd traversal order. */
  within(qx, qy, r) {
    const { ids, coords, nodeSize } = this;
    const stack = [0, ids.length - 1, 0];
    const result = [];
    const r2 = r * r;

    while (stack.length) {
      const axis = stack.pop();
      const right = stack.pop();
      const left = stack.pop();

      if (right - left <= nodeSize) {
        for (let i = left; i <= right; i++) {
          if (sqDist(coords[2 * i], coords[2 * i + 1], qx, qy) <= r2)
            result.push(ids[i]);
        }
        continue;
      }

      const m = (left + right) >> 1;
      const x = coords[2 * m];
      const y = coords[2 * m + 1];
      if (sqDist(x, y, qx, qy) <= r2) result.push(ids[m]);

      if (axis === 0 ? qx - r <= x : qy - r <= y) {
        stack.push(left);
        stack.push(m - 1);
        stack.push(1 - axis);
      }
      if (axis === 0 ? qx + r >= x : qy + r >= y) {
        stack.push(m + 1);
        stack.push(right);
        stack.push(1 - axis);
      }
    }
    return result;
  }
}

function sort(ids, coords, nodeSize, left, right, axis) {
  if (right - left <= nodeSize) return;
  const m = (left + right) >> 1;
  select(ids, coords, m, left, right, axis);
  sort(ids, coords, nodeSize, left, m - 1, 1 - axis);
  sort(ids, coords, nodeSize, m + 1, right, 1 - axis);
}

// Floyd-Rivest selection: partition so coords[2*k+axis] is in its sorted
// position, smaller values left of k, larger right of k
function select(ids, coords, k, left, right, axis) {
  while (right > left) {
    if (right - left > 600) {
      const n = right - left + 1;
      const m = k - left + 1;
      const z = Math.log(n);
      const s = 0.5 * Math.exp((2 * z) / 3);
      const sd =
        0.5 * Math.sqrt((z * s * (n - s)) / n) * (m - n / 2 < 0 ? -1 : 1);
      const newLeft = Math.max(left, Math.floor(k - (m * s) / n + sd));
      const newRight = Math.min(right, Math.floor(k + ((n - m) * s) / n + sd));
      select(ids, coords, k, newLeft, newRight, axis);
    }

    const t = coords[2 * k + axis];
    let i = left;
    let j = right;

    swapItem(ids, coords, left, k);
    if (coords[2 * right + axis] > t) swapItem(ids, coords, left, right);

    while (i < j) {
      swapItem(ids, coords, i, j);
      i++;
      j--;
      while (coords[2 * i + axis] < t) i++;
      while (coords[2 * j + axis] > t) j--;
    }

    if (coords[2 * left + axis] === t) swapItem(ids, coords, left, j);
    else {
      j++;
      swapItem(ids, coords, j, right);
    }

    if (j <= k) left = j + 1;
    if (k <= j) right = j - 1;
  }
}

function swapItem(ids, coords, i, j) {
  swap(ids, i, j);
  swap(coords, 2 * i, 2 * j);
  swap(coords, 2 * i + 1, 2 * j + 1);
}

function swap(arr, i, j) {
  const tmp = arr[i];
  arr[i] = arr[j];
  arr[j] = tmp;
}

function sqDist(ax, ay, bx, by) {
  const dx = ax - bx;
  const dy = ay - by;
  return dx * dx + dy * dy;
}
