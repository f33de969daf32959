// Native scene-compiler core.
//
// The reference engine's scene/ECS layer and physics bookkeeping are C++
// (src/scene/scene.h, src/physics/physics.cpp: collider registration,
// broadphase pair management). This library is the TPU rebuild's native
// equivalent of that host-side runtime: it bakes the static collision
// candidate-pair tables (the reference's runtime 6x6 type-matrix bucketing,
// collision_narrow.cpp:2343-2453, moved to scene-build time) and aggregates
// per-body mass properties (rigid_body.cpp:29-81) at C++ speed, so building
// scenes with tens of thousands of colliders stays sub-second while the
// device-side compute path remains pure JAX/XLA.
//
// Exposed as a C ABI consumed via ctypes (dxk_tpu/scene/native.py).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Pair pruning rules (collision_narrow.cpp:2346-2396):
//  - skip if neither collider belongs to a rigid body
//  - skip if both belong to the same rigid body
//  - orient so colliderA.type <= colliderB.type
//  - trigger/force-field pairs go to the overlap list, not collision lists
//
// owner_type: 0 = rigid body, 1 = static, 2 = force field, 3 = trigger.
//
// Outputs: for each of the 15 unordered type buckets (ta <= tb, 5 types),
// a packed int32 pair list. Returns counts per bucket; the caller passes
// pre-sized output buffers (capacity = the full pair count upper bound).
int32_t bake_pair_tables(
    const int32_t* ctype, const int32_t* owner_type, const int32_t* body,
    int32_t num_colliders,
    int32_t* out_pairs,        // capacity >= C*(C-1)/2 entries of (a, b)
    int32_t* out_bucket_of,    // same capacity; bucket id per pair
    int32_t* out_overlap_pairs,  // trigger/FF pairs (a, b)
    int32_t* out_counts)       // [16]: 15 bucket counts + overlap count
{
    const int32_t C = num_colliders;
    std::memset(out_counts, 0, 16 * sizeof(int32_t));

    int64_t n_coll = 0;
    int64_t n_overlap = 0;

    for (int32_t i = 0; i < C; ++i) {
        const int32_t ti = owner_type[i];
        const bool rb_i = ti == 0;
        for (int32_t j = i + 1; j < C; ++j) {
            const int32_t tj = owner_type[j];
            const bool rb_j = tj == 0;
            if (!rb_i && !rb_j) continue;
            if (rb_i && rb_j && body[i] == body[j]) continue;

            int32_t a = i, b = j;
            if (ctype[a] > ctype[b]) { a = j; b = i; }

            const bool both_rb = rb_i && rb_j;
            const bool one_static = (ti == 1) || (tj == 1);
            if (both_rb || one_static) {
                const int32_t ta = ctype[a], tb = ctype[b];
                // bucket index for ta <= tb over 5 types
                const int32_t bucket = ta * 5 - ta * (ta - 1) / 2 + (tb - ta);
                out_pairs[2 * n_coll] = a;
                out_pairs[2 * n_coll + 1] = b;
                out_bucket_of[n_coll] = bucket;
                ++out_counts[bucket];
                ++n_coll;
            } else {
                out_overlap_pairs[2 * n_overlap] = a;
                out_overlap_pairs[2 * n_overlap + 1] = b;
                ++n_overlap;
            }
        }
    }
    out_counts[15] = (int32_t)n_overlap;
    return (int32_t)n_coll;
}

// Aggregate per-body mass properties from per-collider properties
// (rigid_body_component::recalculateProperties, rigid_body.cpp:29-81):
// masses sum; COG is the mass-weighted mean; inertias combine about the
// shared COG via the parallel-axis theorem.
//
// collider arrays: mass[C], cog[C*3], inertia[C*9] (about each collider's
// own COG, row-major). body_of[C] maps collider -> body (or -1).
// Outputs per body: mass[N], cog[N*3], inertia[N*9].
void aggregate_mass_properties(
    const double* mass, const double* cog, const double* inertia,
    const int32_t* body_of, int32_t num_colliders, int32_t num_bodies,
    double* out_mass, double* out_cog, double* out_inertia)
{
    std::memset(out_mass, 0, num_bodies * sizeof(double));
    std::memset(out_cog, 0, num_bodies * 3 * sizeof(double));
    std::memset(out_inertia, 0, num_bodies * 9 * sizeof(double));

    for (int32_t c = 0; c < num_colliders; ++c) {
        const int32_t b = body_of[c];
        if (b < 0) continue;
        out_mass[b] += mass[c];
        for (int k = 0; k < 3; ++k)
            out_cog[b * 3 + k] += mass[c] * cog[c * 3 + k];
    }
    for (int32_t b = 0; b < num_bodies; ++b) {
        if (out_mass[b] > 0.0)
            for (int k = 0; k < 3; ++k) out_cog[b * 3 + k] /= out_mass[b];
    }
    for (int32_t c = 0; c < num_colliders; ++c) {
        const int32_t b = body_of[c];
        if (b < 0) continue;
        double r[3];
        for (int k = 0; k < 3; ++k) r[k] = cog[c * 3 + k] - out_cog[b * 3 + k];
        const double rr = r[0] * r[0] + r[1] * r[1] + r[2] * r[2];
        for (int row = 0; row < 3; ++row) {
            for (int col = 0; col < 3; ++col) {
                double shift = -r[row] * r[col];
                if (row == col) shift += rr;
                out_inertia[b * 9 + row * 3 + col] +=
                    inertia[c * 9 + row * 3 + col] + mass[c] * shift;
            }
        }
    }
}

// Greedy graph coloring of constraints by shared bodies — precomputed
// schedule for conflict-free parallel solver phases (the build-time analog
// of the reference's runtime scheduleConstraintsSIMD,
// constraints.cpp:51-184). Constraints in the same color share no body and
// can be solved in parallel with exact Gauss-Seidel semantics across colors.
// body pairs: (a, b) per constraint; dummy_body conflicts with nothing.
// Returns the number of colors; out_color[i] = color of constraint i.
int32_t color_constraints(
    const int32_t* body_a, const int32_t* body_b, int32_t num_constraints,
    int32_t dummy_body, int32_t* out_color)
{
    std::vector<int32_t> body_last_color; // per body, last color used + 1
    int32_t num_colors = 0;

    // find max body index
    int32_t max_body = 0;
    for (int32_t i = 0; i < num_constraints; ++i) {
        if (body_a[i] > max_body) max_body = body_a[i];
        if (body_b[i] > max_body) max_body = body_b[i];
    }
    // color bitmap per body (supports up to 64 colors cheaply)
    std::vector<uint64_t> used(max_body + 1, 0);

    for (int32_t i = 0; i < num_constraints; ++i) {
        const int32_t a = body_a[i];
        const int32_t b = body_b[i];
        uint64_t mask = 0;
        if (a != dummy_body) mask |= used[a];
        if (b != dummy_body) mask |= used[b];
        int32_t color = 0;
        while (color < 64 && (mask >> color) & 1) ++color;
        if (color >= 64) color = 63; // degenerate; cap
        if (a != dummy_body) used[a] |= (1ull << color);
        if (b != dummy_body) used[b] |= (1ull << color);
        out_color[i] = color;
        if (color + 1 > num_colors) num_colors = color + 1;
    }
    return num_colors;
}

}  // extern "C"
