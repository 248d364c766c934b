"""r5_ab14b: reversed-order confirm of the lane-aligned env-count A/B
(r5_ab14) — same harness, opposite build order, fresh process, results
appended to r5_ab14_results.jsonl with a pass tag."""
import importlib.util
import sys

sys.path.insert(0, "/root/repo")

spec = importlib.util.spec_from_file_location(
    "r5_ab14", "/root/repo/artifacts/round5/r5_ab14_lane_aligned_envcounts.py"
)
ab14 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ab14)


def main():
    import jax

    print("acquiring device...", flush=True)
    print(f"device: {jax.devices()[0].platform}", flush=True)
    _emit = ab14.emit
    ab14.emit = lambda rec: _emit({**rec, "pass": "reversed"})
    for e in (100000, 102400, 131072):
        ab14.cartpole(e)
    for e in (32000, 32768):
        ab14.gridworld(e)
    print("done", flush=True)


if __name__ == "__main__":
    main()
