// Native (C++) batched environment steppers for the CPU backend.
//
// The reference accelerates env stepping with native per-thread kernels
// (CUDA C++ / numba-jitted device code, e.g.
// example_envs/single_agent/classic_control/cartpole/cartpole_step_numba.py:5-83,
// example_envs/tag_gridworld/tag_gridworld_step_pycuda.cu); the TPU compute
// path here is JAX/Pallas, and THIS file is the native equivalent for the
// host CPU backend (reference EnvWrapper env_backend='cpu'): one C++ call
// steps every env replica, replacing the per-env python loop.
//
// Semantics contract: numerically identical to the numpy reference
// implementations in warpdrive_tpu/envs/. Under NumPy 2 (NEP 50) python
// float constants are weak — float32 state stays float32 through the
// arithmetic — so these kernels use float arithmetic with the double
// constants rounded to float exactly where numpy rounds them.
// sin/cos are computed as (float)sin((double)x): numpy's float32 loops
// are correctly-rounded to ~1 ulp, so trajectories agree to float
// precision (asserted by tests/test_native_backend.py).
//
// Build: g++ -O3 -shared -fPIC (see native/__init__.py; no external deps).

#include <cmath>
#include <cstdint>

namespace {

// ----- CartPole constants (warpdrive_tpu/envs/classic_control/cartpole.py)
const float GRAVITY = 9.8f;
const float MASSPOLE = 0.1f;
const float TOTAL_MASS = (float)(0.1 + 1.0);  // MASSPOLE + MASSCART
const float LENGTH = 0.5f;                    // half the pole's length
const float POLEMASS_LENGTH = (float)(0.1 * 0.5);
const float FORCE_MAG = 10.0f;
const float TAU = 0.02f;
const float FOUR_THIRDS = (float)(4.0 / 3.0);
const float THETA_THRESHOLD_RADIANS = (float)(12.0 * 2.0 * M_PI / 360.0);
const float X_THRESHOLD = 2.4f;

// (dx, dy) per discrete action: no-op, +x, -x, +y, -y
const int STEP_DX[5] = {0, 1, -1, 0, 0};
const int STEP_DY[5] = {0, 0, 0, 1, -1};

}  // namespace

extern "C" {

// CartPole: advance every env one step.
//   state:     (n_envs, 4) float32, updated in place  [x, x_dot, th, th_dot]
//   actions:   (n_envs,)   int32    {0, 1}
//   timesteps: (n_envs,)   int32, incremented in place
//   rewards:   (n_envs,)   float32 out (always +1, incl. terminating step)
//   dones:     (n_envs,)   int32 out (1 on termination or episode end)
void wd_cartpole_step(int n_envs, float* state, const int* actions,
                      int* timesteps, float* rewards, int* dones,
                      int episode_length) {
  for (int e = 0; e < n_envs; ++e) {
    float* s = state + 4 * e;
    timesteps[e] += 1;
    const float force = actions[e] > 0 ? FORCE_MAG : -FORCE_MAG;
    float x = s[0], x_dot = s[1], theta = s[2], theta_dot = s[3];
    const float costheta = (float)cos((double)theta);
    const float sintheta = (float)sin((double)theta);
    const float temp =
        (force + POLEMASS_LENGTH * (theta_dot * theta_dot) * sintheta) /
        TOTAL_MASS;
    const float thetaacc =
        (GRAVITY * sintheta - costheta * temp) /
        (LENGTH * (FOUR_THIRDS - MASSPOLE * (costheta * costheta) / TOTAL_MASS));
    const float xacc =
        temp - POLEMASS_LENGTH * thetaacc * costheta / TOTAL_MASS;
    x = x + TAU * x_dot;
    x_dot = x_dot + TAU * xacc;
    theta = theta + TAU * theta_dot;
    theta_dot = theta_dot + TAU * thetaacc;
    s[0] = x;
    s[1] = x_dot;
    s[2] = theta;
    s[3] = theta_dot;
    const bool terminated = (x < -X_THRESHOLD) || (x > X_THRESHOLD) ||
                            (theta < -THETA_THRESHOLD_RADIANS) ||
                            (theta > THETA_THRESHOLD_RADIANS);
    rewards[e] = 1.0f;
    dones[e] = (timesteps[e] >= episode_length || terminated) ? 1 : 0;
  }
}

// TagGridWorld: advance every env one step (N-1 taggers chase 1 runner,
// the runner is the LAST agent).
//   loc_x/loc_y: (n_envs, n_agents) int32, updated in place
//   actions:     (n_envs, n_agents) int32 in [0, 5)
//   timesteps:   (n_envs,) int32, incremented in place
//   rewards:     (n_envs, n_agents) float32 out
//   dones:       (n_envs,) int32 out
// Penalty/reward terms are applied in float32 with the double config
// values rounded to float first (numpy NEP-50 weak-scalar semantics).
void wd_tag_gridworld_step(int n_envs, int n_agents, int grid_length,
                           int* loc_x, int* loc_y, const int* actions,
                           int* timesteps, float* rewards, int* dones,
                           int episode_length, double wall_hit_penalty,
                           double tag_reward_for_tagger,
                           double tag_penalty_for_runner,
                           double step_cost_for_tagger) {
  const float wall_pen_f = (float)(-wall_hit_penalty);
  const float tag_rew_f = (float)tag_reward_for_tagger;
  const float tag_pen_f = (float)(-tag_penalty_for_runner);
  const float step_cost_f = (float)step_cost_for_tagger;
  const float neg_step_cost_f = (float)(-step_cost_for_tagger);
  for (int e = 0; e < n_envs; ++e) {
    int* lx = loc_x + (long)e * n_agents;
    int* ly = loc_y + (long)e * n_agents;
    const int* act = actions + (long)e * n_agents;
    float* rew = rewards + (long)e * n_agents;
    timesteps[e] += 1;

    for (int a = 0; a < n_agents; ++a) {
      const int nx = lx[a] + STEP_DX[act[a]];
      const int ny = ly[a] + STEP_DY[act[a]];
      const int cx = nx < 0 ? 0 : (nx > grid_length ? grid_length : nx);
      const int cy = ny < 0 ? 0 : (ny > grid_length ? grid_length : ny);
      const bool wall_hit = (nx != cx) || (ny != cy);
      rew[a] = wall_hit ? wall_pen_f : 0.0f;
      lx[a] = cx;
      ly[a] = cy;
    }
    bool tag = false;
    const int rx = lx[n_agents - 1], ry = ly[n_agents - 1];
    for (int a = 0; a < n_agents - 1; ++a) {
      if (lx[a] == rx && ly[a] == ry) { tag = true; break; }
    }
    for (int a = 0; a < n_agents - 1; ++a) {
      rew[a] = (tag ? tag_rew_f : neg_step_cost_f) + rew[a];
    }
    rew[n_agents - 1] = (tag ? tag_pen_f : step_cost_f) + rew[n_agents - 1];
    dones[e] = (timesteps[e] >= episode_length || tag) ? 1 : 0;
  }
}

// TagGridWorld observation build.
//   full observation  (use_full != 0): (n_envs, n_agents, 4*N + 1)
//     [x_all/L, y_all/L, types, onehot(self), t/T]
//   partial           (use_full == 0): (n_envs, n_agents, 6)
//     [own_x, own_y, target_x, target_y, is_runner, t/T]
void wd_tag_gridworld_observe(int n_envs, int n_agents, int grid_length,
                              const int* loc_x, const int* loc_y,
                              const int* timesteps, int episode_length,
                              int use_full, float* obs) {
  const float L = (float)grid_length;
  const int N = n_agents;
  const int D = use_full ? (4 * N + 1) : 6;
  for (int e = 0; e < n_envs; ++e) {
    const int* lx = loc_x + (long)e * N;
    const int* ly = loc_y + (long)e * N;
    float* o_env = obs + (long)e * N * D;
    const float t_norm = (float)((double)timesteps[e] / (double)episode_length);
    if (use_full) {
      for (int a = 0; a < N; ++a) {
        float* o = o_env + (long)a * D;
        for (int j = 0; j < N; ++j) o[j] = (float)lx[j] / L;
        for (int j = 0; j < N; ++j) o[N + j] = (float)ly[j] / L;
        for (int j = 0; j < N; ++j) o[2 * N + j] = (j == N - 1) ? 1.0f : 0.0f;
        for (int j = 0; j < N; ++j) o[3 * N + j] = (j == a) ? 1.0f : 0.0f;
        o[4 * N] = t_norm;
      }
    } else {
      // nearest tagger to the runner (squared distance, lowest id on ties)
      long best = 0;
      long best_d2 = 0x7fffffffffffffffL;
      for (int a = 0; a < N - 1; ++a) {
        const long dx = (long)lx[a] - lx[N - 1];
        const long dy = (long)ly[a] - ly[N - 1];
        const long d2 = dx * dx + dy * dy;
        if (d2 < best_d2) { best_d2 = d2; best = a; }
      }
      for (int a = 0; a < N; ++a) {
        float* o = o_env + (long)a * D;
        const bool is_runner = (a == N - 1);
        o[0] = (float)lx[a] / L;
        o[1] = (float)ly[a] / L;
        o[2] = is_runner ? (float)lx[best] / L : (float)lx[N - 1] / L;
        o[3] = is_runner ? (float)ly[best] / L : (float)ly[N - 1] / L;
        o[4] = is_runner ? 1.0f : 0.0f;
        o[5] = t_norm;
      }
    }
  }
}

}  // extern "C"
