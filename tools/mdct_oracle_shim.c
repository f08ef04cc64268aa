/* Test-only shim exposing the reference MDCT with a flat C ABI for ctypes.
 * Compiled against the read-only reference tree by tools/build_oracle.sh. */
#include <string.h>
#include "mdct.h"

int oracle_mdct_forward(int N, int overlap, int shift, int stride,
                        const float *window, float *in, float *out)
{
    mdct_lookup l;
    int i;
    if (!clt_mdct_init(&l, N, shift > 0 ? shift : 0, 0))
        return -1;
    clt_mdct_forward_c(&l, in, out, window, overlap, shift, stride, 0);
    (void)i;
    clt_mdct_clear(&l, 0);
    return 0;
}

int oracle_mdct_backward(int N, int overlap, int shift, int stride,
                         const float *window, float *in, float *out)
{
    mdct_lookup l;
    if (!clt_mdct_init(&l, N, shift > 0 ? shift : 0, 0))
        return -1;
    clt_mdct_backward_c(&l, in, out, window, overlap, shift, stride, 0);
    clt_mdct_clear(&l, 0);
    return 0;
}
