"""Adaptive Huffman Tree (host/sequential path).

Functional mirror of the reference's src/aht.c (doc src/include/aht.h:1-10):
an adaptive Huffman tree maintained per inserted symbol, used purely as a
COST MODEL — `score` = Σ weight·depth is the exact optimal compressed bit
count of the symbol stream so far, driving the chunk-split heuristic
(reference README.md:15-20). Mirrored pieces:
  * NYT (not-yet-transmitted) split on first occurrence
    (reference aht_insert :243-263)
  * interchange with block leader (aht_interchange_leaf :214-219,
    aht_get_block_leader :30-40) -> _interchange/_block_leader
  * running score (aht.h score field; reference maintains it via O(1) swap
    deltas :206-211 — here the Σ internal-node-weights identity)
  * invariant checker (aht_check_score :330-349) -> check()
  * tree printer (aht_print :279-328) -> dump()

Algorithm note: the reference implements Vitter's slide-and-increment
variant (aht_sai :115-139, aht_slide :64-113). This implementation uses the
FGK (Knuth) update — interchange with the block leader, then increment, then
climb. Both maintain Gallager's sibling property, and by Gallager's theorem
every sibling-property tree is an optimal Huffman tree for its weights, so
the `score` sequence (the only thing the cost model consumes) is IDENTICAL;
Vitter's refinement only changes tree height / number of interchanges, which
does not affect Σ weight·depth. The strong test for this is
tests/test_aht.py: score must equal the static optimal Huffman cost of the
running histogram after every insert.
"""
from __future__ import annotations


class _Node:
    __slots__ = ("weight", "sym", "parent", "left", "right", "num")

    def __init__(self, weight=0, sym=None, parent=None, num=0):
        self.weight = weight
        self.sym = sym          # symbol for real leaves, None otherwise
        self.parent = parent
        self.left = None
        self.right = None
        self.num = num

    @property
    def is_leaf(self):
        return self.left is None


class AdaptiveHuffmanTree:
    """Adaptive Huffman tree over an integer symbol alphabet."""

    def __init__(self, alphabet_size: int = 286):
        self.alphabet_size = alphabet_size
        self.max_num = 2 * alphabet_size - 1
        self.root = _Node(weight=0, num=self.max_num)
        self.nyt = self.root
        self.leaves: dict[int, _Node] = {}
        self.nodes: list[_Node] = [self.root]
        self._score = 0

    # ------------------------------------------------------------------ api
    def insert(self, sym: int) -> None:
        """Account one symbol occurrence (reference aht_insert aht.c:239-277)."""
        q = self.leaves.get(sym)
        if q is None:
            # split NYT: it becomes internal with children (new NYT, leaf)
            p = self.nyt
            new_nyt = _Node(weight=0, parent=p, num=p.num - 2)
            leaf = _Node(weight=0, sym=sym, parent=p, num=p.num - 1)
            p.left, p.right = new_nyt, leaf
            self.nyt = new_nyt
            self.leaves[sym] = leaf
            self.nodes += [new_nyt, leaf]
            leaf.weight = 1
            q = p                   # old NYT, now internal; climb from here
        else:
            leader = self._block_leader(q)
            if leader is not q and leader is not q.parent:
                self._interchange(q, leader)
            q.weight += 1
            q = q.parent
        while q is not None:
            leader = self._block_leader(q)
            if leader is not q and leader is not q.parent:
                self._interchange(q, leader)
            q.weight += 1
            q = q.parent
        self._score = None          # invalidate cache

    @property
    def score(self) -> int:
        """Σ weight·depth == Σ internal-node weights (running optimal bit
        count; reference aht.h score field)."""
        if self._score is None:
            self._score = sum(n.weight for n in self.nodes if not n.is_leaf)
        return self._score

    def depths(self) -> dict[int, int]:
        out = {}
        for s, leaf in self.leaves.items():
            d = 0
            n = leaf
            while n.parent is not None:
                d += 1
                n = n.parent
            out[s] = d
        return out

    # ----------------------------------------------------------- invariants
    def check(self) -> None:
        """Invariant checker (reference aht_check_score aht.c:330-349)."""
        total = 0
        for s, leaf in self.leaves.items():
            d = 0
            n = leaf
            while n.parent is not None:
                d += 1
                n = n.parent
            total += leaf.weight * d
        assert total == self.score, f"score {self.score} != recomputed {total}"

        def wsum(n):
            if n.is_leaf:
                return n.weight
            w = wsum(n.left) + wsum(n.right)
            assert n.weight == w, "internal weight mismatch"
            return w
        wsum(self.root)
        # numbering: nondecreasing weight with number; parents numbered higher
        by_num = sorted(self.nodes, key=lambda n: n.num)
        for a, b in zip(by_num, by_num[1:]):
            assert a.weight <= b.weight, "weight ordering violated"
        for n in self.nodes:
            if n.parent is not None:
                assert n.parent.num > n.num, "parent numbering violated"

    def dump(self, node=None, depth=0, out=None) -> str:
        """ASCII tree dump (reference aht_print aht.c:279-328)."""
        top = out is None
        if out is None:
            out = []
            node = self.root
        tag = (f"leaf[{node.sym}]" if node.is_leaf and node.sym is not None
               else ("NYT" if node.is_leaf else "int"))
        out.append("  " * depth + f"{tag} w={node.weight} #{node.num}")
        if not node.is_leaf:
            self.dump(node.right, depth + 1, out)
            self.dump(node.left, depth + 1, out)
        return "\n".join(out) if top else ""

    # ------------------------------------------------------------ internals
    def _block_leader(self, q):
        """Highest-numbered node with q's weight (reference
        aht_get_block_leader aht.c:30-40)."""
        best = q
        w = q.weight
        for n in self.nodes:
            if n.weight == w and n.num > best.num:
                best = n
        return best

    def _interchange(self, a, b):
        """Swap tree positions and numbers of a and b, subtrees included
        (reference aht_swap aht.c:141-212)."""
        pa, pb = a.parent, b.parent
        a_left = pa.left is a
        b_left = pb.left is b
        if a_left:
            pa.left = b
        else:
            pa.right = b
        if b_left:
            pb.left = a
        else:
            pb.right = a
        a.parent, b.parent = pb, pa
        a.num, b.num = b.num, a.num


def aht_cost_trace(symbols, alphabet_size: int = 286):
    """Cumulative optimal-bits trace, one entry per symbol — the reference's
    telemetry format B (`bytes, compressed_bits`, results/results_.txt:1;
    SURVEY §6)."""
    t = AdaptiveHuffmanTree(alphabet_size)
    out = []
    for s in symbols:
        t.insert(int(s))
        out.append(t.score)
    return out
