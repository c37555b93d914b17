"""Single-node brute-force oracle for the record-linkage pipeline.

Mirrors the reference's conformance strategy (SURVEY §5: golden
end-to-end outputs recomputed and compared): the distributed blocking +
scoring + CC pipeline must reproduce, with pairwise F1 ≥ 0.99, the
clusters a trusted O(n²) single-node implementation of the *same match
rule* produces.  This is the real gate on blocking recall (did LSH find
every matching pair?) and on CC correctness — not a tautology, because
the oracle enumerates ALL pairs, with a sound upper-bound prefilter:

    lev_sim(a, b) = 1 - D/max(n,m)  ≤  bag_intersection(a, b)/max(n,m)

so pairs pruned by the bound can never reach the threshold.  Usable up
to ~10^4 docs; the distributed path is the scale story.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Tuple

from elevant_ray.functions.tokens import unigrams
from elevant_ray.stages.scoring import token_lev_similarity


def bruteforce_match_pairs(
    ids: Sequence, texts: Sequence[str], canons: Sequence[str],
    threshold: float = 0.75,
) -> List[Tuple]:
    """All (left < right) id pairs matching the rule: same canonical url
    OR token-lev-sim ≥ threshold."""
    toks = [unigrams(t) for t in texts]
    bags = [Counter(t) for t in toks]
    lens = [len(t) for t in toks]
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    pairs: List[Tuple] = []
    for oi in range(len(order)):
        i = order[oi]
        for oj in range(oi + 1, len(order)):
            j = order[oj]
            if canons[i] == canons[j]:
                pairs.append((ids[i], ids[j]))
                continue
            mx = max(lens[i], lens[j], 1)
            inter = sum((bags[i] & bags[j]).values())
            if inter / mx < threshold:
                continue
            if token_lev_similarity(toks[i], toks[j]) >= threshold:
                pairs.append((ids[i], ids[j]))
    return pairs


def transitive_closure(pairs: List[Tuple]) -> Dict:
    """Union-find closure → {id: min-id-of-component} (matches the
    distributed hash-min labeling exactly)."""
    parent: Dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo
    labels = {}
    for a, b in pairs:
        labels[a] = find(a)
        labels[b] = find(b)
    return labels


def cluster_pairs_from_labels(labels: Dict) -> set:
    """Expand component labels to the full within-cluster pair set."""
    by_label: Dict = {}
    for node, lab in labels.items():
        by_label.setdefault(lab, []).append(node)
    out = set()
    for members in by_label.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out.add((members[i], members[j]))
    return out


def pairwise_prf(pred_pairs: set, gold_pairs: set) -> dict:
    tp = len(pred_pairs & gold_pairs)
    fp = len(pred_pairs - gold_pairs)
    fn = len(gold_pairs - pred_pairs)
    from elevant_ray.stages.evaluation import f1_dict

    return f1_dict(tp, fp, fn)
