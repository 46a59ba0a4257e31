"""Measured TF1-style baseline for vs_baseline grounding.

Builds a CLSR-SHAPED workload the way the reference executes it
(tf.compat.v1 graph mode, feed_dict, per-row replication, three
dynamic_rnn while-loops, two attention MLPs, BN head, grouped softmax,
Adam + per-tensor clip) and measures training examples/sec on this host.

This is a structural replica written against tf.compat.v1 — NOT the
reference's code (which requires tf.contrib / TF 1.15).  The Time4LSTM
stand-in is a plain LSTMCell (slightly LESS compute than the real cell, so
the baseline is measured generously).  The published numbers' hardware was
"a Linux desktop" (reference README.md:7); a desktop GPU would land within
a small multiple of this CPU measurement for this workload size.

Usage: python scripts/baseline_tf1.py [--batch 500] [--steps 20]
"""

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500,
                    help="positive rows per step (expanded x5 like the ref)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--seq", type=int, default=50)
    args = ap.parse_args()

    import tensorflow as tf
    tf1 = tf.compat.v1
    tf1.disable_eager_execution()
    tf1.disable_v2_behavior()

    B0, L = args.batch, args.seq
    NGS = 4
    B = B0 * (1 + NGS)           # replicated rows, like the reference
    N_ITEMS, N_CATES, N_USERS = 100_000, 5_000, 50_000
    ID, CD, UD, H = 32, 8, 40, 40

    _dctr = []
    g = tf1.Graph()
    with g.as_default():
        init = tf1.truncated_normal_initializer(stddev=0.01)
        items_ph = tf1.placeholder(tf.int32, [None])
        cates_ph = tf1.placeholder(tf.int32, [None])
        users_ph = tf1.placeholder(tf.int32, [None])
        hist_i_ph = tf1.placeholder(tf.int32, [None, L])
        hist_c_ph = tf1.placeholder(tf.int32, [None, L])
        mask_ph = tf1.placeholder(tf.float32, [None, L])
        t1_ph = tf1.placeholder(tf.float32, [None, L])
        t2_ph = tf1.placeholder(tf.float32, [None, L])
        labels_ph = tf1.placeholder(tf.float32, [None])

        item_tab = tf1.get_variable("item_emb", [N_ITEMS, ID], initializer=init)
        cate_tab = tf1.get_variable("cate_emb", [N_CATES, CD], initializer=init)
        ul_tab = tf1.get_variable("ul_emb", [N_USERS, UD], initializer=init)
        us_tab = tf1.get_variable("us_emb", [N_USERS, UD], initializer=init)

        hist = tf.concat([tf.nn.embedding_lookup(item_tab, hist_i_ph),
                          tf.nn.embedding_lookup(cate_tab, hist_c_ph)], 2)
        target = tf.concat([tf.nn.embedding_lookup(item_tab, items_ph),
                            tf.nn.embedding_lookup(cate_tab, cates_ph)], 1)
        ul = tf.nn.embedding_lookup(ul_tab, users_ph)
        us = tf.nn.embedding_lookup(us_tab, users_ph)
        seq_len = tf.cast(tf.reduce_sum(mask_ph, 1), tf.int32)

        def dense(x, units, name, activation=None):
            D = int(x.shape[-1])
            with tf1.variable_scope(name):
                W = tf1.get_variable("W", [D, units], initializer=init)
                b = tf1.get_variable("b", [units],
                                     initializer=tf1.zeros_initializer())
            y = tf.tensordot(x, W, [[x.shape.ndims - 1], [0]]) + b
            return activation(y) if activation else y

        def batch_norm(x, name):
            C = int(x.shape[-1])
            with tf1.variable_scope(name):
                gamma = tf1.get_variable("gamma", [C],
                                         initializer=tf1.ones_initializer())
                beta = tf1.get_variable("beta", [C],
                                        initializer=tf1.zeros_initializer())
            axes = list(range(x.shape.ndims - 1))
            mean, var = tf.nn.moments(x, axes=axes, keepdims=True)
            return tf.nn.batch_normalization(x, mean, var, beta, gamma, 1e-4)

        def att_fcn(query, keys, scope):
            with tf1.variable_scope(scope):
                q = tf.shape(keys)[1]
                W = tf1.get_variable("att_mat",
                                     [keys.shape[-1], query.shape[-1]],
                                     initializer=init)
                ai = tf.tensordot(keys, W, [[2], [0]])
                qq = tf.tile(query[:, None, :], [1, L, 1])
                feats = tf.concat([ai, qq, ai - qq, ai * qq], -1)
                x = feats
                for i, sz in enumerate((80, 40)):
                    x = dense(x, sz, f'd{_dctr.append(0) or len(_dctr)}')
                    x = batch_norm(x, f'bn{_dctr.append(0) or len(_dctr)}')
                    x = tf.nn.relu(x)
                logit = dense(x, 1, f'd{_dctr.append(0) or len(_dctr)}')[..., 0]
                paddings = tf.ones_like(logit) * (-2.0 ** 32 + 1)
                w = tf.nn.softmax(tf.where(mask_ph > 0, logit, paddings))
                return tf.reduce_sum(keys * w[..., None], 1)

        # keras-3 TF removed compat rnn_cell; hand-rolled tf.scan GRU/LSTM
        # have the same while-loop execution profile as dynamic_rnn
        def gru_scan(x, init_state, units, scope):
            D = int(x.shape[-1])
            with tf1.variable_scope(scope):
                Wg = tf1.get_variable("Wg", [D + units, 2 * units])
                bg = tf1.get_variable("bg", [2 * units],
                                      initializer=tf1.ones_initializer())
                Wc = tf1.get_variable("Wc", [D + units, units])
                bc = tf1.get_variable("bc", [units],
                                      initializer=tf1.zeros_initializer())

            def step(h, inp):
                x_t, m_t = inp
                gates = tf.sigmoid(tf.matmul(tf.concat([x_t, h], 1), Wg) + bg)
                r, u = tf.split(gates, 2, axis=1)
                c = tf.tanh(tf.matmul(tf.concat([x_t, r * h], 1), Wc) + bc)
                h_new = u * h + (1 - u) * c
                return m_t[:, None] * h_new + (1 - m_t[:, None]) * h

            xs = tf.transpose(x, [1, 0, 2])
            ms = tf.transpose(mask_ph, [1, 0])
            hs = tf.scan(step, (xs, ms), initializer=init_state)
            return tf.transpose(hs, [1, 0, 2]), hs[-1]

        def lstm_scan(x, units, scope):
            D = int(x.shape[-1])
            with tf1.variable_scope(scope):
                W = tf1.get_variable("W", [D + units, 4 * units])
                b = tf1.get_variable("b", [4 * units],
                                     initializer=tf1.zeros_initializer())

            def step(carry, inp):
                c, h = carry
                x_t, m_t = inp
                mat = tf.matmul(tf.concat([x_t, h], 1), W) + b
                i, j, f, o = tf.split(mat, 4, axis=1)
                c_new = tf.sigmoid(f + 1.0) * c + tf.sigmoid(i) * tf.tanh(j)
                h_new = tf.sigmoid(o) * tf.tanh(c_new)
                mt = m_t[:, None]
                return (mt * c_new + (1 - mt) * c,
                        mt * h_new + (1 - mt) * h)

            xs = tf.transpose(x, [1, 0, 2])
            ms = tf.transpose(mask_ph, [1, 0])
            zeros = tf.zeros([tf.shape(x)[0], units])
            cs, hs = tf.scan(step, (xs, ms), initializer=(zeros, zeros))
            return tf.transpose(hs, [1, 0, 2]), hs[-1]

        _, sti = gru_scan(hist, us, UD, "rnn1")
        rnn_out, _ = lstm_scan(
            tf.concat([hist, t1_ph[..., None], t2_ph[..., None]], -1),
            H, "rnn2")
        zeros_h = tf.zeros([tf.shape(hist)[0], H])
        _, causal2 = gru_scan(hist, zeros_h, H, "rnn3")

        att_long = att_fcn(ul, hist, "long")
        att_short = att_fcn(tf.concat([sti, target], -1), rnn_out, "short")

        concat_all = tf.concat(
            [causal2, target, att_long, att_short, t2_ph[:, -1:]], 1)
        x = concat_all
        with tf1.variable_scope("alpha"):
            for sz in (80, 40):
                x = dense(x, sz, f'd{_dctr.append(0) or len(_dctr)}')
                x = batch_norm(x, f'bn{_dctr.append(0) or len(_dctr)}')
                x = tf.nn.relu(x)
            alpha = tf.sigmoid(dense(x, 1, f'd{_dctr.append(0) or len(_dctr)}'))
        user_embed = att_long * alpha + att_short * (1 - alpha)

        x = tf.concat([user_embed, target], 1)
        with tf1.variable_scope("head"):
            for sz in (100, 64):
                x = dense(x, sz, f'd{_dctr.append(0) or len(_dctr)}')
                x = batch_norm(x, f'bn{_dctr.append(0) or len(_dctr)}')
                x = tf.nn.relu(x)
            logit = dense(x, 1, f'd{_dctr.append(0) or len(_dctr)}')[..., 0]

        group = 1 + NGS
        logits_g = tf.reshape(logit, (-1, group))
        labels_g = tf.reshape(labels_ph, (-1, group))
        softmax_pred = tf.nn.softmax(logits_g)
        pos = tf.where(tf.equal(labels_g, 1.0), softmax_pred,
                       tf.ones_like(softmax_pred))
        loss = -group * tf.reduce_mean(tf.math.log(pos))

        opt = tf1.train.AdamOptimizer(0.001)
        grads_vars = opt.compute_gradients(loss)
        clipped = [(None if gv[0] is None else tf.clip_by_norm(gv[0], 2.0),
                    gv[1]) for gv in grads_vars]
        update = opt.apply_gradients(clipped)
        update_ops = tf1.get_collection(tf1.GraphKeys.UPDATE_OPS)
        init_op = tf1.global_variables_initializer()

    rng = np.random.RandomState(0)
    lengths = rng.randint(1, L + 1, B)
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    labels = np.zeros((B0, 1 + NGS), np.float32)
    labels[:, 0] = 1
    feed = {
        items_ph: rng.randint(1, N_ITEMS, B),
        cates_ph: rng.randint(1, N_CATES, B),
        users_ph: rng.randint(0, N_USERS, B),
        hist_i_ph: rng.randint(1, N_ITEMS, (B, L)) * mask,
        hist_c_ph: rng.randint(1, N_CATES, (B, L)) * mask,
        mask_ph: mask,
        t1_ph: rng.rand(B, L).astype(np.float32),
        t2_ph: rng.rand(B, L).astype(np.float32),
        labels_ph: labels.reshape(-1),
    }

    sess = tf1.Session(graph=g)
    sess.run(init_op)
    for _ in range(3):
        sess.run([update, update_ops, loss], feed_dict=feed)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        sess.run([update, update_ops, loss], feed_dict=feed)
    dt = time.perf_counter() - t0
    per_sec = B0 * args.steps / dt
    print(f"TF1-compat CLSR-shaped baseline on host CPU: "
          f"{per_sec:,.0f} examples/s ({dt/args.steps*1e3:.1f} ms/step, "
          f"batch {B0} positives -> {B} rows)")


if __name__ == "__main__":
    sys.exit(main())
