import json, sys, tempfile, os
sys.path.insert(0, '/root/repo')
iid = sys.argv[1]
items = {json.loads(l)['id']: json.loads(l) for l in open('/root/repo/samples/synth_v2_dev.jsonl')}
it = items[iid]
print('Q:', it['question'])
print('A:', it['answers'])
print('gold_titles:', it['gold_titles'])
from ahrag_tpu.cli.benchmark import build_question_graph, run_system
from ahrag_tpu.utils.config import load_config
cfg = load_config()
with tempfile.TemporaryDirectory() as wd:
    hg = build_question_graph(it['context'], wd)
    ans = run_system('ah_rag', it['question'], cfg, hg)
print('PRED:', ans.get('answer'))
from ahrag_tpu.answer.context import ContextProcessor
# re-derive the context the generator saw is hard; just dump any context_text
ctx=(ans.get('context') or {}).get('context_text','');print('CTX:', ctx[:5000])
print('used nodes:', [n for n in (ans.get('used_nodes') or [])][:12])
for k in ('evidence', 'retrieved', 'seeds'):
    if k in ans:
        v = ans[k]
        print(k, ':', json.dumps(v, indent=1, default=str)[:6000])
