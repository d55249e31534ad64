"""OntoEA joint entity/class embedding training — numpy re-implementation
of the reference's TF-1.14 graph, hosted in a single Ray actor (the
reference is likewise a single training process; SURVEY.md §4 keeps the
trainer centralized for parity, with the data layer distributed).

Loss semantics reproduced from /root/reference/code/src/openea/modules/
base/losses.py and approaches/ontoea.py (cited, not copied):

- limited (pos/neg margin) TransE triple loss on L2-normalized lookups
  (losses.py:79-93; lookups normalized at ontoea.py:193-198)
- onto hierarchy loss 'hier': ||l2norm(tanh(h·W+b)) - t||² limited, the
  JOIE-style nonlinear subclass projection (losses.py:96-115); 'linear'
  variant h - t (weights=None)
- membership (cv-link) loss with the ent->onto MLP (losses.py:118-137)
- CCM likelihood: sigma * -sum(CCM ⊙ log sigmoid(E1 E2ᵀ)) on RAW (not
  normalized) ontology embeddings, row-sliced (ontoea.py:268-280,337-356)
- alignment mapping loss: alpha*(batch-scalar limited mapping + ||MMᵀ-I||²)
  + gamma*||path-pooled class emb diff||² + beta*||pseudo-onto diff||²
  (losses.py:169-184; graph ontoea.py:292-335).  NOTE the reference's
  mapping_limit_loss applies margins to the BATCH-SUM score (a scalar),
  not per row — reproduced as-is.
- Adagrad (optimizers.py; lr 0.01 / cv 0.001 / likelihood 0.001)
- schedule: per iteration, sub_epoch epochs of ent triples -> onto triples
  -> likelihood -> cv links -> align_sub_epoch mapping epochs; early stop
  on two consecutive validation declines (ontoea.py:551-623,
  evaluation.py:39-44)
- eval embeddings: RAW entity lookups; class-path pooled ontology
  embeddings (per-vector normalized; the reference's eval path normalizes
  over the depth axis — ontoea.py:638 — an axis quirk we do not copy);
  fusion: e1 @ M vs e2 with type_mat = cosine of pooled class embeddings
  (ontoea.py:666-685,763-771)

Training parity is metric-level (Hits@1/MRR on fixture splits), not
bitwise: the reference is unseeded; we seed for self-reproducibility.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


# ---------------------------------------------------------------------------
# config (defaults follow run/args/ontoea_args_15K.json, dims scaled down)
# ---------------------------------------------------------------------------

@dataclass
class OntoEAConfig:
    dim: int = 64
    onto_dim: int = 32
    pos_margin: float = 0.01
    neg_margin: float = 2.0
    neg_margin_balance: float = 0.2
    neg_triple_num: int = 5
    learning_rate: float = 0.01
    cv_link_lr: float = 0.001
    likelihood_lr: float = 0.001
    alpha: float = 5.0
    gamma: float = 1.0
    beta: float = 0.0
    sigma: float = 1.0
    batch_size: int = 1024
    onto_batch_size: int = 64
    cvlink_batch_size: int = 512
    likelihood_slice: int = 10
    onto_likelihood_epochs: int = 2
    sub_epoch: int = 5
    align_sub_epoch: int = 5
    max_epoch: int = 60
    start_valid: int = 10
    eval_freq: int = 1
    onto_training_method: str = "hier"   # 'hier' | 'linear'
    alignment_neg_sampling: str = "type_based"
    neg_sampling: str = "uniform"        # 'uniform' | 'truncated'
    truncated_epsilon: float = 0.9
    truncated_freq: int = 2              # iterations between kNN refreshes
    onto_neg_sampling: str | None = None  # None | 'prob_based'
    seed: int = 42


@dataclass
class KGTrainData:
    """Id-encoded inputs (built by the Ray loader/id layer upstream)."""

    num_entities: int
    num_relations: int
    num_classes: int
    num_onto_relations: int
    rel_triples: np.ndarray           # [n, 3] int64 (h, r, t) both KGs
    onto_triples: np.ndarray          # [m, 3] int64 (c, r, p)
    cv_links: np.ndarray              # [k, 2] int64 (entity, class)
    train_pairs: np.ndarray           # [s, 2] int64 (e1, e2)
    valid_pairs: np.ndarray
    test_pairs: np.ndarray
    ent_class: np.ndarray             # [num_entities] int64 class id
    class_paths: np.ndarray           # [C, D] int64 (left-padded, 0 pad)
    class_masks: np.ndarray           # [C, D] float64 softmax position weights
    ccm: np.ndarray                   # [C, C] float64
    kg1_entities: np.ndarray = field(default_factory=lambda: np.array([], np.int64))
    kg2_entities: np.ndarray = field(default_factory=lambda: np.array([], np.int64))


# ---------------------------------------------------------------------------
# numerical helpers
# ---------------------------------------------------------------------------

def _norm_rows(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = np.sqrt((x * x).sum(axis=-1, keepdims=True))
    n = np.maximum(n, 1e-12)
    return x / n, n


def _norm_backward(u: np.ndarray, n: np.ndarray, g_u: np.ndarray) -> np.ndarray:
    """d/dv of u = v/||v|| given upstream grad g_u."""
    return (g_u - u * (u * g_u).sum(axis=-1, keepdims=True)) / n


class _Adagrad:
    def __init__(self, shape, lr):
        self.lr = np.float32(lr)
        self.acc = np.zeros(shape, np.float32)

    def update_rows(self, param, rows, grads):
        """Sparse row update with duplicate-row accumulation."""
        uniq, inv = np.unique(rows, return_inverse=True)
        g = np.zeros((len(uniq), param.shape[1]), np.float32)
        np.add.at(g, inv, grads.astype(np.float32, copy=False))
        self.acc[uniq] += g * g
        param[uniq] -= self.lr * g / (np.sqrt(self.acc[uniq]) + 1e-8)

    def update_dense(self, param, grad):
        grad = grad.astype(np.float32, copy=False)
        self.acc += grad * grad
        param -= self.lr * grad / (np.sqrt(self.acc) + np.float32(1e-8))


def _tanh_norm_forward(e: np.ndarray, W: np.ndarray, b: np.ndarray):
    z = e @ W + b
    a = np.tanh(z)
    p, n = _norm_rows(a)
    return p, (e, a, n)


def _tanh_norm_backward(g_p: np.ndarray, cache, W: np.ndarray):
    e, a, n = cache
    u = a / n
    g_a = _norm_backward(u, n, g_p)
    g_z = g_a * (1 - a * a)
    return g_z @ W.T, e.T @ g_z, g_z.sum(axis=0)   # g_e, g_W, g_b


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

class OntoEATrainer:
    """Single-actor trainer (wrap with ray.remote(OntoEATrainer) to host it
    on the cluster; all methods are plain numpy)."""

    def __init__(self, data: KGTrainData, cfg: OntoEAConfig | None = None):
        self.d = data
        self.cfg = cfg or OntoEAConfig()
        c = self.cfg
        rng = np.random.default_rng(c.seed)
        self.rng = rng

        def unit_init(n, dim):
            m = rng.standard_normal((n, dim)).astype(np.float32)
            return _norm_rows(m)[0]

        def orth_init(din, dout):
            m = rng.standard_normal((max(din, dout), max(din, dout)))
            q, _ = np.linalg.qr(m)
            return q[:din, :dout].astype(np.float32).copy()

        self.ent = unit_init(data.num_entities, c.dim) if self._dense_ent_init() else None
        self.rel = unit_init(max(data.num_relations, 1), c.dim)
        self.onto = unit_init(data.num_classes, c.onto_dim)
        self.onto_rel = unit_init(max(data.num_onto_relations, 1), c.onto_dim)
        self.M = orth_init(c.dim, c.dim)
        self.cv_W = orth_init(c.dim, c.onto_dim)
        self.cv_b = np.zeros(c.onto_dim, np.float32)
        self.hier_W = orth_init(c.onto_dim, c.onto_dim)
        self.hier_b = np.zeros(c.onto_dim, np.float32)

        self.opt_ent = (
            _Adagrad(self.ent.shape, c.learning_rate) if self.ent is not None else None
        )
        self.opt_rel = _Adagrad(self.rel.shape, c.learning_rate)
        self.opt_onto = _Adagrad(self.onto.shape, c.learning_rate)
        self.opt_onto_rel = _Adagrad(self.onto_rel.shape, c.learning_rate)
        self.opt_onto_ll = _Adagrad(self.onto.shape, c.likelihood_lr)
        self.opt_M = _Adagrad(self.M.shape, c.learning_rate)
        self.opt_cv_W = _Adagrad(self.cv_W.shape, c.cv_link_lr)
        self.opt_cv_b = _Adagrad(self.cv_b.shape, c.cv_link_lr)
        self.opt_hier_W = _Adagrad(self.hier_W.shape, c.learning_rate)
        self.opt_hier_b = _Adagrad(self.hier_b.shape, c.learning_rate)

        # encoded triple keys, sorted — rejection checks are vectorized
        # searchsorted lookups instead of Python set membership
        self._enc_base = (data.num_relations + 1, data.num_entities + 1)
        self._true_keys = np.sort(self._encode_triples(data.rel_triples))
        self._neighbors: dict | None = None   # truncated hard-negative pools
        if c.onto_neg_sampling == "prob_based":
            # softmax over (1 - CCM) rows: incompatible classes are likelier
            # negatives (reference ontoea.py:567-568, sample.py:7-8)
            z = 1.0 - data.ccm
            e = np.exp(z - z.max(axis=1, keepdims=True))
            self._onto_neg_prob = e / e.sum(axis=1, keepdims=True)
        # class -> entity pool for type-based alignment negatives
        self._class_pool: dict[int, np.ndarray] = {}
        for cl in np.unique(data.ent_class):
            self._class_pool[int(cl)] = np.nonzero(data.ent_class == cl)[0]

    def _encode_triples(self, t: np.ndarray) -> np.ndarray:
        r_base, e_base = self._enc_base
        return (t[:, 0].astype(np.int64) * r_base + t[:, 1]) * e_base + t[:, 2]

    def _is_true(self, t: np.ndarray) -> np.ndarray:
        keys = self._encode_triples(t)
        idx = np.searchsorted(self._true_keys, keys)
        idx = np.minimum(idx, len(self._true_keys) - 1)
        return self._true_keys[idx] == keys

    # ---- negative sampling (reference batch.py:103-265 semantics) --------

    def _neg_triples(self, pos: np.ndarray, num_neg: int) -> np.ndarray:
        """Corrupt head or tail (p=0.5) uniformly, rejecting true triples
        with up to 10 retries."""
        n = len(pos) * num_neg
        rep = np.repeat(pos, num_neg, axis=0)
        out = rep.copy()
        corrupt_head = self.rng.random(n) < 0.5

        def draw(orig_ids: np.ndarray) -> np.ndarray:
            if self._neighbors is None:
                return self.rng.integers(0, self.d.num_entities, len(orig_ids))
            # truncated sampling: candidates restricted to each entity's
            # nearest-neighbor pool (reference basic_model.py:416-432)
            picks = np.empty(len(orig_ids), np.int64)
            for i, e in enumerate(orig_ids):
                pool = self._neighbors.get(int(e))
                picks[i] = (
                    pool[self.rng.integers(0, len(pool))]
                    if pool is not None and len(pool)
                    else self.rng.integers(0, self.d.num_entities)
                )
            return picks

        out[corrupt_head, 0] = draw(rep[corrupt_head, 0])
        out[~corrupt_head, 2] = draw(rep[~corrupt_head, 2])
        cand = None
        for _ in range(10):
            bad = self._is_true(out)
            if not bad.any():
                break
            redo = np.nonzero(bad)[0]
            cand2 = self.rng.integers(0, self.d.num_entities, len(redo))
            ch = self.rng.random(len(redo)) < 0.5
            out[redo] = rep[redo]
            out[redo[ch], 0] = cand2[ch]
            out[redo[~ch], 2] = cand2[~ch]
        return out

    def _neg_pairs_type_based(self, pos: np.ndarray) -> np.ndarray:
        """Alignment negatives: corrupt one side with an entity from the
        SAME class pool (uniform fallback when the pool is trivial)."""
        out = pos.copy()
        n = len(pos)
        side = self.rng.random(n) < 0.5
        cols = np.where(side, 0, 1)
        ents = pos[np.arange(n), cols]
        picks = self.rng.integers(0, self.d.num_entities, n)
        if self.cfg.alignment_neg_sampling == "type_based":
            classes = self.d.ent_class[ents]
            # vectorized per-class pool draw: group rows by class once
            for cl in np.unique(classes):
                pool = self._class_pool.get(int(cl))
                if pool is None or len(pool) < 2:
                    continue
                rows = np.nonzero(classes == cl)[0]
                picks[rows] = pool[self.rng.integers(0, len(pool), len(rows))]
        out[np.arange(n), cols] = picks
        return out

    # ---- entity-table indirection (overridden by the sharded trainer) ----

    def _dense_ent_init(self) -> bool:
        return True

    def _ent_gather(self, ids: np.ndarray) -> np.ndarray:
        return self.ent[ids]

    def _ent_update(self, rows: np.ndarray, grads: np.ndarray) -> None:
        self.opt_ent.update_rows(self.ent, rows, grads)

    def ent_matrix(self) -> np.ndarray:
        """Dense entity table (artifact/eval surface; O(N) — the sharded
        trainer overrides this to concat shard snapshots, and at scale the
        artifact path should use ent_dataset() instead)."""
        return self.ent

    # ---- loss steps ------------------------------------------------------

    def _limited_transe_step(self, pos, neg) -> float:
        c = self.cfg
        rel_emb = self.rel
        b = len(pos)
        fetched = self._ent_gather(
            np.concatenate([pos[:, 0], pos[:, 2], neg[:, 0], neg[:, 2]])
        )
        nb = len(neg)
        e_ph, e_pt = fetched[:b], fetched[b : 2 * b]
        e_nh, e_nt = fetched[2 * b : 2 * b + nb], fetched[2 * b + nb :]
        ph, pn = _norm_rows(e_ph); pr, prn = _norm_rows(rel_emb[pos[:, 1]]); pt, ptn = _norm_rows(e_pt)
        nh, nn = _norm_rows(e_nh); nr, nrn = _norm_rows(rel_emb[neg[:, 1]]); nt, ntn = _norm_rows(e_nt)
        pd = ph + pr - pt
        nd = nh + nr - nt
        ps = (pd * pd).sum(1)
        ns = (nd * nd).sum(1)
        pos_active = ps > c.pos_margin
        neg_active = ns < c.neg_margin
        loss = float(np.maximum(ps - c.pos_margin, 0).sum() + c.neg_margin_balance * np.maximum(c.neg_margin - ns, 0).sum())
        gp = 2 * pd * pos_active[:, None]
        gn = -2 * nd * neg_active[:, None] * c.neg_margin_balance
        rows = np.concatenate([pos[:, 0], pos[:, 2], neg[:, 0], neg[:, 2]])
        grads = np.concatenate([
            _norm_backward(ph, pn, gp), _norm_backward(pt, ptn, -gp),
            _norm_backward(nh, nn, gn), _norm_backward(nt, ntn, -gn),
        ])
        self._ent_update(rows, grads)
        r_rows = np.concatenate([pos[:, 1], neg[:, 1]])
        r_grads = np.concatenate([_norm_backward(pr, prn, gp), _norm_backward(nr, nrn, gn)])
        self.opt_rel.update_rows(rel_emb, r_rows, r_grads)
        return loss

    def _hier_step(self, pos, neg) -> float:
        """Onto-triple step: 'hier' (tanh-MLP projection) or 'linear'."""
        c = self.cfg
        ph, pn = _norm_rows(self.onto[pos[:, 0]]); pt, ptn = _norm_rows(self.onto[pos[:, 2]])
        nh, nn = _norm_rows(self.onto[neg[:, 0]]); nt, ntn = _norm_rows(self.onto[neg[:, 2]])
        if c.onto_training_method == "hier":
            pp, pcache = _tanh_norm_forward(ph, self.hier_W, self.hier_b)
            np_, ncache = _tanh_norm_forward(nh, self.hier_W, self.hier_b)
            pd = pp - pt
            nd = np_ - nt
        else:
            pd = ph - pt
            nd = nh - nt
        ps = (pd * pd).sum(1)
        ns = (nd * nd).sum(1)
        pos_active = ps > c.pos_margin
        neg_active = ns < c.neg_margin
        loss = float(np.maximum(ps - c.pos_margin, 0).sum() + c.neg_margin_balance * np.maximum(c.neg_margin - ns, 0).sum())
        gp = 2 * pd * pos_active[:, None]
        gn = -2 * nd * neg_active[:, None] * c.neg_margin_balance
        if c.onto_training_method == "hier":
            g_ph, gW1, gb1 = _tanh_norm_backward(gp, pcache, self.hier_W)
            g_nh, gW2, gb2 = _tanh_norm_backward(gn, ncache, self.hier_W)
            self.opt_hier_W.update_dense(self.hier_W, gW1 + gW2)
            self.opt_hier_b.update_dense(self.hier_b, gb1 + gb2)
        else:
            g_ph, g_nh = gp, gn
        rows = np.concatenate([pos[:, 0], pos[:, 2], neg[:, 0], neg[:, 2]])
        grads = np.concatenate([
            _norm_backward(ph, pn, g_ph), _norm_backward(pt, ptn, -gp),
            _norm_backward(nh, nn, g_nh), _norm_backward(nt, ntn, -gn),
        ])
        self.opt_onto.update_rows(self.onto, rows, grads)
        return loss

    def _cv_step(self, pos, neg) -> float:
        c = self.cfg
        fetched = self._ent_gather(np.concatenate([pos[:, 0], neg[:, 0]]))
        pe, pen = _norm_rows(fetched[: len(pos)]); pc_, pcn = _norm_rows(self.onto[pos[:, 1]])
        ne, nen = _norm_rows(fetched[len(pos) :]); nc, ncn = _norm_rows(self.onto[neg[:, 1]])
        pp, pcache = _tanh_norm_forward(pe, self.cv_W, self.cv_b)
        np_, ncache = _tanh_norm_forward(ne, self.cv_W, self.cv_b)
        pd = pp - pc_
        nd = np_ - nc
        ps = (pd * pd).sum(1)
        ns = (nd * nd).sum(1)
        loss = float(np.maximum(ps - c.pos_margin, 0).sum() + c.neg_margin_balance * np.maximum(c.neg_margin - ns, 0).sum())
        gp = 2 * pd * (ps > c.pos_margin)[:, None]
        gn = -2 * nd * (ns < c.neg_margin)[:, None] * c.neg_margin_balance
        g_pe, gW1, gb1 = _tanh_norm_backward(gp, pcache, self.cv_W)
        g_ne, gW2, gb2 = _tanh_norm_backward(gn, ncache, self.cv_W)
        self.opt_cv_W.update_dense(self.cv_W, gW1 + gW2)
        self.opt_cv_b.update_dense(self.cv_b, gb1 + gb2)
        self._ent_update(
            np.concatenate([pos[:, 0], neg[:, 0]]),
            np.concatenate([_norm_backward(pe, pen, g_pe), _norm_backward(ne, nen, g_ne)]),
        )
        self.opt_onto.update_rows(
            self.onto,
            np.concatenate([pos[:, 1], neg[:, 1]]),
            np.concatenate([_norm_backward(pc_, pcn, -gp), _norm_backward(nc, ncn, -gn)]),
        )
        return loss

    def _likelihood_step(self, idx: np.ndarray) -> float:
        c = self.cfg
        E1 = self.onto[idx]
        E2 = self.onto
        S = E1 @ E2.T
        sig = 1.0 / (1.0 + np.exp(-S))
        ccm = self.d.ccm[idx, :]
        loss = float(c.sigma * -(ccm * np.log(np.maximum(sig, 1e-30))).sum())
        G = -c.sigma * ccm * (1 - sig)       # dL/dS
        g1 = G @ E2
        g2 = G.T @ E1
        self.opt_onto_ll.update_rows(self.onto, idx, g1)
        self.opt_onto_ll.update_rows(self.onto, np.arange(self.d.num_classes), g2)
        return loss

    def _mapping_step(self, pos: np.ndarray, neg: np.ndarray) -> float:
        c = self.cfg
        d = self.d
        nb = len(pos)
        fetched = self._ent_gather(
            np.concatenate([pos[:, 0], pos[:, 1], neg[:, 0], neg[:, 1]])
        )
        u1, n1 = _norm_rows(fetched[:nb]); u2, n2 = _norm_rows(fetched[nb : 2 * nb])
        v1, m1 = _norm_rows(fetched[2 * nb : 2 * nb + len(neg)]); v2, m2 = _norm_rows(fetched[2 * nb + len(neg) :])
        mapped = u1 @ self.M
        nmapped = v1 @ self.M
        pos_score = float(((u2 - mapped) ** 2).sum())
        neg_score = float(((v2 - nmapped) ** 2).sum())
        # batch-scalar margins (reference mapping_limit_loss semantics)
        pos_on = pos_score > c.pos_margin
        neg_on = neg_score < c.neg_margin
        loss = max(pos_score - c.pos_margin, 0.0) + c.neg_margin_balance * max(c.neg_margin - neg_score, 0.0)
        ortho = self.M @ self.M.T - np.eye(c.dim, dtype=np.float32)
        loss += float((ortho * ortho).sum())

        g_map = -2 * (u2 - mapped) * pos_on
        g_nmap = 2 * (v2 - nmapped) * neg_on * c.neg_margin_balance
        gM = u1.T @ g_map + v1.T @ g_nmap + 4 * ortho @ self.M
        g_u1 = g_map @ self.M.T
        g_u2 = 2 * (u2 - mapped) * pos_on
        g_v1 = g_nmap @ self.M.T
        g_v2 = -2 * (v2 - nmapped) * neg_on * c.neg_margin_balance
        # alpha scales the whole mapping term
        gM *= c.alpha
        loss_total = c.alpha * loss
        ent_rows = [pos[:, 0], pos[:, 1], neg[:, 0], neg[:, 1]]
        ent_grads = [
            c.alpha * _norm_backward(u1, n1, g_u1),
            c.alpha * _norm_backward(u2, n2, g_u2),
            c.alpha * _norm_backward(v1, m1, g_v1),
            c.alpha * _norm_backward(v2, m2, g_v2),
        ]

        # gamma * || pooled class-path emb diff ||²
        if c.gamma > 0:
            cls1 = d.ent_class[pos[:, 0]]
            cls2 = d.ent_class[pos[:, 1]]
            p1, mask1 = d.class_paths[cls1], d.class_masks[cls1]     # [b, D]
            p2, mask2 = d.class_paths[cls2], d.class_masks[cls2]
            o1, on1 = _norm_rows(self.onto[p1])                      # [b, D, dc]
            o2, on2 = _norm_rows(self.onto[p2])
            w1 = (o1 * mask1[:, :, None]).sum(axis=1)
            w2 = (o2 * mask2[:, :, None]).sum(axis=1)
            diff = w1 - w2
            loss_total += c.gamma * float((diff * diff).sum())
            g_w = 2 * c.gamma * diff
            g_o1 = g_w[:, None, :] * mask1[:, :, None]
            g_o2 = -g_w[:, None, :] * mask2[:, :, None]
            self.opt_onto.update_rows(
                self.onto,
                np.concatenate([p1.reshape(-1), p2.reshape(-1)]),
                np.concatenate([
                    _norm_backward(o1, on1, g_o1).reshape(-1, c.onto_dim),
                    _norm_backward(o2, on2, g_o2).reshape(-1, c.onto_dim),
                ]),
            )

        # beta * || pseudo-onto diff ||² through the cv MLP
        if c.beta > 0:
            pp1, cache1 = _tanh_norm_forward(u1, self.cv_W, self.cv_b)
            pp2, cache2 = _tanh_norm_forward(u2, self.cv_W, self.cv_b)
            pdiff = pp1 - pp2
            loss_total += c.beta * float((pdiff * pdiff).sum())
            g1, gW1, gb1 = _tanh_norm_backward(2 * c.beta * pdiff, cache1, self.cv_W)
            g2, gW2, gb2 = _tanh_norm_backward(-2 * c.beta * pdiff, cache2, self.cv_W)
            self.opt_cv_W.update_dense(self.cv_W, gW1 + gW2)
            self.opt_cv_b.update_dense(self.cv_b, gb1 + gb2)
            ent_rows += [pos[:, 0], pos[:, 1]]
            ent_grads += [_norm_backward(u1, n1, g1), _norm_backward(u2, n2, g2)]

        self._ent_update(np.concatenate(ent_rows), np.concatenate(ent_grads))
        self.opt_M.update_dense(self.M, gM)
        return loss_total

    # ---- epochs ----------------------------------------------------------

    def _epoch(self, data: np.ndarray, batch_size: int, step_fn) -> float:
        perm = self.rng.permutation(len(data))
        total = 0.0
        for s in range(0, len(data), batch_size):
            total += step_fn(data[perm[s : s + batch_size]])
        return total / max(len(data), 1)

    def train_iteration(self) -> dict:
        c, d = self.cfg, self.d
        losses = {}
        for _ in range(c.sub_epoch):
            losses["triple"] = self._epoch(
                d.rel_triples, c.batch_size,
                lambda b: self._limited_transe_step(b, self._neg_triples(b, c.neg_triple_num)),
            )
        for _ in range(c.sub_epoch):
            losses["onto"] = self._epoch(
                d.onto_triples, c.onto_batch_size,
                lambda b: self._hier_step(b, self._corrupt_onto(b)),
            )
        for _ in range(c.onto_likelihood_epochs):
            steps = max(d.num_classes // c.likelihood_slice, 1)
            tot = 0.0
            for _s in range(steps):
                idx = self.rng.choice(d.num_classes, size=min(c.likelihood_slice, d.num_classes), replace=False)
                tot += self._likelihood_step(idx)
            losses["likelihood"] = tot / d.num_classes
        for _ in range(c.sub_epoch):
            losses["cv"] = self._epoch(
                d.cv_links, c.cvlink_batch_size,
                lambda b: self._cv_step(b, self._corrupt_cv(b)),
            )
        for _ in range(c.align_sub_epoch):
            losses["mapping"] = self._epoch(
                d.train_pairs, c.batch_size,
                lambda b: self._mapping_step(b, self._neg_pairs_type_based(b)),
            )
        return losses

    def _corrupt_onto(self, pos: np.ndarray) -> np.ndarray:
        out = pos.copy()
        side = self.rng.random(len(pos)) < 0.5
        if self.cfg.onto_neg_sampling == "prob_based":
            cand = np.array(
                [
                    self.rng.choice(self.d.num_classes, p=self._onto_neg_prob[pos[i, 0 if side[i] else 2]])
                    for i in range(len(pos))
                ],
                np.int64,
            )
        else:
            cand = self.rng.integers(0, self.d.num_classes, len(pos))
        out[side, 0] = cand[side]
        out[~side, 2] = cand[~side]
        return out

    def refresh_neighbors(self) -> None:
        """Rebuild truncated hard-negative pools from the current (L2-
        normalized) entity embeddings, per KG (reference ontoea.py:606-621)."""
        from ontoea_ray.stages.neighbors import generate_neighbours

        pools: dict[int, np.ndarray] = {}
        for ids in (self.d.kg1_entities, self.d.kg2_entities):
            if len(ids) == 0:
                continue
            k = max(1, int((1 - self.cfg.truncated_epsilon) * len(ids)))
            emb = _norm_rows(self._ent_gather(ids))[0]
            pools.update(generate_neighbours(emb, ids, k))
        self._neighbors = pools or None

    def _corrupt_cv(self, pos: np.ndarray) -> np.ndarray:
        out = pos.copy()
        out[:, 1] = self.rng.integers(0, self.d.num_classes, len(pos))
        return out

    # ---- evaluation ------------------------------------------------------

    def eval_embeddings(self, pairs: np.ndarray):
        """(e1 @ M, e2, pooled_onto1, pooled_onto2) for the given pairs —
        raw entity lookups, per-vector-normalized path pooling."""
        d = self.d
        fetched = self._ent_gather(np.concatenate([pairs[:, 0], pairs[:, 1]]))
        e1 = fetched[: len(pairs)]
        e2 = fetched[len(pairs) :]
        cls1 = d.ent_class[pairs[:, 0]]
        cls2 = d.ent_class[pairs[:, 1]]
        o1 = _norm_rows(self.onto[d.class_paths[cls1]])[0]
        o2 = _norm_rows(self.onto[d.class_paths[cls2]])[0]
        w1 = (o1 * d.class_masks[cls1][:, :, None]).sum(axis=1)
        w2 = (o2 * d.class_masks[cls2][:, :, None]).sum(axis=1)
        return e1 @ self.M, e2, w1, w2

    def evaluate(self, pairs: np.ndarray, *, use_ray: bool = False, top_k=(1, 5, 10, 50)) -> dict:
        """Fused eval: sim(norm(e1M), norm(e2)) + gamma * cosine(onto1, onto2)."""
        from ontoea_ray.functions.similarity import l2_normalize, sim_dense

        f1, f2, w1, w2 = self.eval_embeddings(pairs)
        if use_ray:
            from ontoea_ray.pipelines.alignment import greedy_alignment_eval

            # type FEATURES, not a precomputed dense type matrix: each eval
            # block computes its own block x n type-sim chunk, so nothing in
            # the distributed path is n x n (the old ccm-gather trick built
            # the full per-pair matrix in this actor first — actor-memory-
            # bound at the 100K tier)
            return greedy_alignment_eval(
                l2_normalize(f1).astype(np.float32), l2_normalize(f2).astype(np.float32),
                top_k=top_k,
                type1=l2_normalize(w1), type2=l2_normalize(w2),
                type_weight=self.cfg.gamma,
            )
        type_mat = sim_dense(l2_normalize(w1), l2_normalize(w2), metric="inner")
        s = sim_dense(f1, f2, metric="inner", normalize=True) + self.cfg.gamma * type_mat
        order = np.argsort(-s, axis=1)
        ranks = np.array([np.nonzero(order[i] == i)[0][0] for i in range(len(pairs))])
        return {
            "hits": {k: round(float((ranks < k).sum()) / len(pairs) * 100, 3) for k in top_k},
            "mr": float((ranks + 1).mean()),
            "mrr": float((1 / (ranks + 1)).mean()),
        }

    def run(self, *, verbose: bool = False) -> dict:
        """Full schedule with early stop on two consecutive valid declines."""
        c = self.cfg
        iters = max(c.max_epoch // c.sub_epoch, 1)
        # reference early_stop (evaluation.py:39-44): stop when the metric
        # declines (non-strictly) twice in a row: cur <= prev <= prev_prev
        flag1 = flag2 = -1.0
        history = []
        for i in range(1, iters + 1):
            losses = self.train_iteration()
            if c.neg_sampling == "truncated" and i % max(c.truncated_freq, 1) == 0:
                self.refresh_neighbors()
            if i * c.sub_epoch >= c.start_valid and i % c.eval_freq == 0:
                m = self.evaluate(self.d.valid_pairs if len(self.d.valid_pairs) else self.d.test_pairs)
                cur = m["hits"][1]
                history.append(cur)
                if verbose:
                    print(f"iter {i}: losses={losses} valid hits@1={cur}")
                stop = cur <= flag2 <= flag1 and flag1 >= 0
                flag1, flag2 = flag2, cur
                if stop:
                    break
        test = self.evaluate(self.d.test_pairs)
        return {"test": test, "valid_history": history}


# ---------------------------------------------------------------------------
# sharded trainer (parameter-server entity table)
# ---------------------------------------------------------------------------

class ShardedOntoEATrainer(OntoEATrainer):
    """OntoEA trainer whose ENTITY table (the only O(num_entities x dim)
    state) lives row-partitioned across K parameter-server actors
    (state/param_server.py) instead of this process's heap.  Every other
    table (rel, onto, M, MLPs — all O(relations/classes/dim²)) stays local.

    Two init modes:
    - scatter (default): the dense seeded init is built once, scattered to
      the shards and freed — consumes the SAME rng draws as the dense
      trainer, so a sharded run is bit-identical to OntoEATrainer for any
      shard count (pinned in tests/test_training.py).
    - shard_init=True: each shard draws its own rows from rng([seed, i])
      and the table never exists densely anywhere — the at-scale path
      (metric-level equivalent, not bitwise: skipping the dense draw
      shifts the rng stream for the other tables).

    Consistency: per-batch gathers fan out to the owning shards and updates
    are fired without blocking; Ray's per-actor FIFO guarantees a later
    gather sees every earlier update (read-your-writes per row), matching
    the dense trainer's sequential SGD exactly.  The kNN hard-negative
    refresh streams shard blocks through the blockwise Dataset kernel, so
    no step of the schedule materializes the table in one process."""

    def __init__(self, data: KGTrainData, cfg: OntoEAConfig | None = None, *,
                 num_shards: int | None = None, shard_init: bool = False):
        self._num_shards = num_shards
        self._shard_init = shard_init
        super().__init__(data, cfg)
        from ontoea_ray.state.param_server import ShardedEntityStore

        init = self.ent  # None when shard_init (base skipped the draw)
        self.ent_store = ShardedEntityStore(
            data.num_entities, self.cfg.dim, self.cfg.learning_rate,
            num_shards=num_shards, init_array=init, seed=self.cfg.seed,
        )
        self.ent = None
        self.opt_ent = None

    def _dense_ent_init(self) -> bool:
        return not self._shard_init

    def _ent_gather(self, ids: np.ndarray) -> np.ndarray:
        return self.ent_store.gather(ids)

    def _ent_update(self, rows: np.ndarray, grads: np.ndarray) -> None:
        self.ent_store.update(rows, grads)

    def ent_matrix(self) -> np.ndarray:
        return self.ent_store.matrix()

    def ent_dataset(self, **kw):
        """The entity table as a Dataset of per-shard Arrow blocks."""
        return self.ent_store.to_dataset(**kw)

    def train_iteration(self) -> dict:
        out = super().train_iteration()
        self.ent_store.sync()   # surface any shard-side error per iteration
        return out

    def refresh_neighbors(self) -> None:
        """Blockwise kNN refresh: per-KG shard blocks (normalized shard-
        side) stream through generate_neighbours_blockwise — the table is
        never gathered into this actor (reference ontoea.py:606-621)."""
        import ray as _ray

        from ontoea_ray.stages.neighbors import generate_neighbours_blockwise

        # leave the shard actors' CPUs out of the kNN pool so the map stage
        # can always start (fixed pools sized >= free CPUs stall)
        free = int(
            _ray.cluster_resources().get("CPU", 8) - self.ent_store.reserved_cpus
        )
        conc = (1, max(1, free - 1))
        pools: dict[int, np.ndarray] = {}
        for ids in (self.d.kg1_entities, self.d.kg2_entities):
            if len(ids) == 0:
                continue
            k = max(1, int((1 - self.cfg.truncated_epsilon) * len(ids)))
            ds = self.ent_store.to_dataset(ids=np.sort(ids), normalize=True)
            out = generate_neighbours_blockwise(ds, k, concurrency=conc)
            for batch in out.iter_batches(batch_format="pyarrow"):
                ents = batch["entity"].to_numpy(zero_copy_only=False)
                nbrs = batch["neighbors"]
                for e, p in zip(ents, nbrs.to_pylist()):
                    pools[int(e)] = np.asarray(p, np.int64)
        self._neighbors = pools or None
