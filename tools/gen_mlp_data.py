"""Extract the analysis MLP weights from the reference mlp_data.c into
opus_tpu/models/mlp_data.py (the weights are checked into the reference
tree, trained by training/rnn_train.py)."""
import re
import numpy as np

SRC = "/root/reference/src/mlp_data.c"
OUT = "opus_tpu/models/mlp_data.py"

text = open(SRC).read()
arrays = {}
for m in re.finditer(r"static const opus_int8 (\w+)\[(\d+)\] = \{(.*?)\};",
                     text, re.S):
    name, n, body = m.group(1), int(m.group(2)), m.group(3)
    vals = [int(v) for v in re.findall(r"-?\d+", body)]
    assert len(vals) == n, (name, len(vals), n)
    arrays[name] = vals

with open(OUT, "w") as f:
    f.write('"""Analysis MLP weights (extracted from the reference\n'
            'src/mlp_data.c by tools/gen_mlp_data.py; int8, scale 1/128;\n'
            'trained by training/rnn_train.py)."""\n\n')
    f.write("import numpy as np\n\n")
    for name, vals in arrays.items():
        f.write(f"{name.upper()} = np.array([\n")
        for i in range(0, len(vals), 16):
            f.write("    " + ", ".join(str(v) for v in vals[i:i+16])
                    + ",\n")
        f.write("], dtype=np.int8)\n\n")
print("wrote", OUT, {k: len(v) for k, v in arrays.items()})
