"""Word-level G2P CLI: train / evaluate / transcribe (reference ``cube/networks/g2p.py``
``__main__`` :386-413 with patience-based early stopping :296-351).

Modes:
  train:      --train-file F --dev-file F --store BASE [--patience N]
  evaluate:   --test-file F --load BASE            → word accuracy
  transcribe: --transcribe-file F --output-file F --model BASE
"""

import os
import random
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _start_train(args):
    import jax
    import jax.numpy as jnp
    import optax

    from ttscube_tpu.models.g2p import G2P, G2PDataset, seq2seq_loss
    from ttscube_tpu.utils.checkpoint import save_params

    train = G2PDataset(args.train_file)
    dev = G2PDataset(args.dev_file)
    g2p = G2P()
    if args.model_path:
        g2p.load(args.model_path, load_last=True)
        best_acc = g2p.evaluate(dev)
        sys.stdout.write(f"Setting baseline accuracy to {best_acc:.4f}\n")
    else:
        g2p.update_encodings(train)
        g2p.initialize_network()
        g2p.save(args.output_path)
        best_acc = 0.0

    tx = optax.adam(args.lr)
    opt_state = tx.init(g2p.params)
    step_cache = {}

    def make_step(shape):
        if shape not in step_cache:
            @jax.jit
            def step(params, opt_state, x, y):
                def loss_fn(p):
                    logits, _ = g2p.model.apply({"params": p}, x, y)
                    return seq2seq_loss(logits, y)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state2, loss

            step_cache[shape] = step
        return step_cache[shape]

    patience_left = args.patience
    epoch = 1
    save_params(args.output_path + ".last", g2p.params)
    while patience_left > 0:
        patience_left -= 1
        sys.stdout.write(f"\n\nStarting epoch {epoch}\n")
        random.shuffle(train.examples)
        total_loss, n_batches = 0.0, 0
        for i in range(0, len(train.examples), args.batch_size):
            batch = train.examples[i : i + args.batch_size]
            x = g2p.encode_words([w for w, _ in batch])
            y = g2p.encode_labels([t for _, t in batch])
            step = make_step((x.shape[1], y.shape[1]))
            g2p.params, opt_state, loss = step(g2p.params, opt_state,
                                               jnp.asarray(x), jnp.asarray(y))
            total_loss += float(loss)
            n_batches += 1
        sys.stdout.write(f"\tAvg loss: {total_loss / max(n_batches, 1):.6f}\n")
        acc = g2p.evaluate(dev)
        sys.stdout.write(f"\tDevset accuracy: {acc:.4f}\n")
        if acc > best_acc:
            best_acc = acc
            sys.stdout.write(f"\tStoring {args.output_path}.best\n")
            save_params(args.output_path + ".best", g2p.params)
            patience_left = args.patience
        save_params(args.output_path + ".last", g2p.params)
        epoch += 1
        if args.max_epochs != -1 and epoch > args.max_epochs:
            break


def _eval(args):
    from ttscube_tpu.models.g2p import G2P, G2PDataset

    g2p = G2P()
    g2p.load(args.model_path)
    acc = g2p.evaluate(G2PDataset(args.test_file))
    sys.stdout.write(f"Word accuracy rate is {acc * 100:.2f}%\n")


def _transcribe(args):
    from ttscube_tpu.models.g2p import G2P

    g2p = G2P()
    g2p.load(args.model_base)
    with open(args.output_file, "w") as f:
        lines = open(args.transcribe_file).readlines()
        for i in range(0, len(lines), 128):
            words = [l.split("\t")[0].strip() for l in lines[i : i + 128]]
            for w, t in zip(words, g2p.transcribe(words)):
                f.write(f"{w}\t{' '.join(t)}\n")


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu word-level G2P")
    parser.add_argument("--patience", type=int, default=20)
    parser.add_argument("--train-file", dest="train_file")
    parser.add_argument("--dev-file", dest="dev_file")
    parser.add_argument("--store", dest="output_path")
    parser.add_argument("--batch-size", dest="batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--load", dest="model_path")
    parser.add_argument("--test-file", dest="test_file")
    parser.add_argument("--transcribe-file", dest="transcribe_file")
    parser.add_argument("--output-file", dest="output_file")
    parser.add_argument("--model", dest="model_base")
    parser.add_argument("--max-epochs", dest="max_epochs", type=int, default=-1)
    args = parser.parse_args()
    if args.test_file and args.model_path:
        _eval(args)
    elif args.transcribe_file:
        _transcribe(args)
    else:
        _start_train(args)
