#!/usr/bin/env python
"""Build an ArcFace-class face-embeddings .tflite (MobileFaceNet graph).

The reference's ``FaceEmbeddings`` runs a downloadable (not bundled)
ArcFace-style 112x112 -> 128-d model (reference face_embeddings.rs:15-20,
README.md:9-10).  That download is unavailable here, so this tool exports
the same *architecture class* — MobileFaceNet (Chen et al. 2018), the
standard mobile ArcFace embedder: 3x3 stem, PReLU, inverted-residual
bottlenecks, 7x7 global depthwise conv, linear 1x1 conv and a final
FULLY_CONNECTED projection — with deterministic pseudo-random weights.
The exported flatbuffer exercises the full embeddings op set
(FULLY_CONNECTED, MEAN, MUL, PRELU, CONV_2D, DEPTHWISE_CONV_2D, ADD,
RESHAPE, LOGISTIC) so conversion + lowering parity is tested against the
real TFLite interpreter on a genuine ArcFace-class graph.

Usage:
    python tools/make_arcface_tflite.py out.tflite [--width 1.0] [--dim 128]
"""

import argparse
import sys

import numpy as np


def _ch(c, width):
    return max(8, int(round(c * width)))


class _Params:
    """Deterministic he-init parameter factory."""

    def __init__(self, seed=20260816):
        self.rng = np.random.RandomState(seed)

    def conv(self, kh, kw, cin, cout):
        scale = np.sqrt(2.0 / (kh * kw * cin))
        return (self.rng.randn(kh, kw, cin, cout) * scale).astype(np.float32)

    def dw(self, kh, kw, c):
        scale = np.sqrt(2.0 / (kh * kw))
        return (self.rng.randn(kh, kw, c, 1) * scale).astype(np.float32)

    def bias(self, c):
        return (self.rng.randn(c) * 0.05).astype(np.float32)

    def alpha(self, c):
        return (0.25 + 0.05 * self.rng.randn(c)).astype(np.float32)

    def dense(self, cin, cout):
        scale = np.sqrt(1.0 / cin)
        return (self.rng.randn(cin, cout) * scale).astype(np.float32)


def build_model(width=1.0, embed_dim=128, use_se=True):
    """Return a tf.Module whose __call__ is the MobileFaceNet forward."""
    import tensorflow as tf

    p = _Params()

    def conv(x, w, b, alpha=None, stride=1, padding="SAME"):
        y = tf.nn.conv2d(x, w, strides=[1, stride, stride, 1],
                         padding=padding) + b
        if alpha is not None:
            # the max/min/mul/add pattern the TFLite converter fuses to PRELU
            y = tf.nn.relu(y) + alpha * tf.minimum(y, 0.0)
        return y

    def dwconv(x, w, b, alpha=None, stride=1, padding="SAME"):
        y = tf.nn.depthwise_conv2d(x, w, strides=[1, stride, stride, 1],
                                   padding=padding) + b
        if alpha is not None:
            y = tf.nn.relu(y) + alpha * tf.minimum(y, 0.0)
        return y

    layers = []  # list of closures taking/returning NHWC tensors

    def add_conv(cin, cout, k=3, stride=1, act=True, padding="SAME"):
        w, b = p.conv(k, k, cin, cout), p.bias(cout)
        a = p.alpha(cout) if act else None
        layers.append(lambda x: conv(x, w, b, a, stride, padding))
        return cout

    def add_dw(c, k=3, stride=1, act=True, padding="SAME"):
        w, b = p.dw(k, k, c), p.bias(c)
        a = p.alpha(c) if act else None
        layers.append(lambda x: dwconv(x, w, b, a, stride, padding))
        return c

    def add_se(c):
        """Squeeze-excite: MEAN -> 1x1 conv relu -> 1x1 conv sigmoid -> MUL
        (exercises MEAN/MUL/LOGISTIC in the exported graph)."""
        cr = max(8, c // 4)
        w1, b1 = p.conv(1, 1, c, cr), p.bias(cr)
        w2, b2 = p.conv(1, 1, cr, c), p.bias(c)

        def se(x):
            s = tf.reduce_mean(x, axis=[1, 2], keepdims=True)
            s = tf.nn.relu(tf.nn.conv2d(s, w1, 1, "SAME") + b1)
            s = tf.nn.sigmoid(tf.nn.conv2d(s, w2, 1, "SAME") + b2)
            return x * s

        layers.append(se)

    def bottleneck(cin, cout, expand, stride, se=False):
        """MobileFaceNet inverted residual: 1x1 expand PReLU -> 3x3 dw
        PReLU -> 1x1 linear, + residual when stride 1 and cin==cout."""
        cmid = cin * expand
        w1, b1, a1 = p.conv(1, 1, cin, cmid), p.bias(cmid), p.alpha(cmid)
        wd, bd, ad = p.dw(3, 3, cmid), p.bias(cmid), p.alpha(cmid)
        w2, b2 = p.conv(1, 1, cmid, cout), p.bias(cout)
        cr = max(8, cout // 4)
        if se:
            ws1, bs1 = p.conv(1, 1, cout, cr), p.bias(cr)
            ws2, bs2 = p.conv(1, 1, cr, cout), p.bias(cout)

        def block(x):
            y = conv(x, w1, b1, a1)
            y = dwconv(y, wd, bd, ad, stride=stride)
            y = conv(y, w2, b2, None)
            if se:
                s = tf.reduce_mean(y, axis=[1, 2], keepdims=True)
                s = tf.nn.relu(tf.nn.conv2d(s, ws1, 1, "SAME") + bs1)
                s = tf.nn.sigmoid(tf.nn.conv2d(s, ws2, 1, "SAME") + bs2)
                y = y * s
            if stride == 1 and cin == cout:
                y = y + x
            return y

        layers.append(block)
        return cout

    c64, c128 = _ch(64, width), _ch(128, width)
    c512 = _ch(512, width)

    c = add_conv(3, c64, stride=2)                     # 112 -> 56
    c = add_dw(c)                                      # dw conv, PReLU
    c = bottleneck(c, c64, 2, 2)                       # 56 -> 28
    for _ in range(4):
        c = bottleneck(c, c64, 2, 1)
    c = bottleneck(c, c128, 4, 2, se=use_se)           # 28 -> 14
    for _ in range(5):  # one of them carries SE for MEAN/MUL coverage
        c = bottleneck(c, c128, 2, 1)
    c = bottleneck(c, c128, 4, 2)                      # 14 -> 7
    c = bottleneck(c, c128, 2, 1, se=use_se)
    c = add_conv(c, c512, k=1)                         # 1x1 + PReLU
    c = add_dw(c, k=7, padding="VALID", act=False)     # GDConv 7x7 -> 1x1
    c = add_conv(c, c128, k=1, act=False)              # linear bottleneck

    wf, bf = p.dense(c128, embed_dim), p.bias(embed_dim)

    class Net(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 112, 112, 3], tf.float32)])
        def __call__(self, x):
            for layer in layers:
                x = layer(x)
            x = tf.reshape(x, [1, c128])
            return tf.matmul(x, wf) + bf               # FULLY_CONNECTED

    return Net()


def export(out_path, width=1.0, embed_dim=128, use_se=True):
    import tensorflow as tf

    net = build_model(width, embed_dim, use_se)
    cf = net.__call__.get_concrete_function()
    conv = tf.lite.TFLiteConverter.from_concrete_functions([cf], net)
    conv.optimizations = []
    blob = conv.convert()
    with open(out_path, "wb") as f:
        f.write(blob)
    return len(blob)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--no-se", action="store_true")
    args = ap.parse_args()
    n = export(args.out, args.width, args.dim, not args.no_se)
    print(f"wrote {args.out} ({n} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
