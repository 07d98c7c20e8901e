"""Summarize a Spark event log (uncompressed v2 dir): per-stage span, CPU,
shuffle and scan volume. Usage: python tools/stage_report.py /tmp/sparkevents"""
import json, glob, collections, os, sys
d = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sparkevents'
cand=[p for p in glob.glob(d+'/**',recursive=True) if os.path.isfile(p) and 'appstatus' not in p and not p.endswith('.crc')]
tasks=collections.defaultdict(list); stage_names={}
for f in cand:
    for line in open(f, errors='ignore'):
        try: e=json.loads(line)
        except: continue
        ev=e.get('Event')
        if ev=='SparkListenerJobStart':
            desc=(e.get('Properties') or {}).get('spark.job.description','')
            for sid in e.get('Stage IDs',[]):
                if desc: stage_names[sid]=desc
        elif ev=='SparkListenerStageSubmitted':
            si=e['Stage Info']; stage_names.setdefault(si['Stage ID'], si['Stage Name'])
        elif ev=='SparkListenerTaskEnd':
            ti=e['Task Info']; m=e.get('Task Metrics') or {}
            tasks[e['Stage ID']].append((ti['Launch Time'], ti['Finish Time'], m.get('Executor Run Time',0), m.get('JVM GC Time',0),
                (m.get('Shuffle Write Metrics') or {}).get('Shuffle Bytes Written',0),
                (m.get('Input Metrics') or {}).get('Bytes Read',0)))
if not tasks:
    print("no tasks found"); sys.exit(0)
t_min = min(min(l for l,_,_,_,_,_ in ts) for ts in tasks.values())
print(f"{'stage':>5} {'n':>4} {'start':>6} {'span_s':>7} {'wall_s':>7} {'run_s':>7} {'gc_s':>5} {'shW_MB':>7} {'rd_MB':>7}  name")
for s in sorted(tasks):
    ts=tasks[s]
    start=(min(l for l,_,_,_,_,_ in ts)-t_min)/1000
    span=(max(fi for _,fi,_,_,_,_ in ts)-min(l for l,_,_,_,_,_ in ts))/1000
    wall=sum(fi-l for l,fi,_,_,_,_ in ts)/1000
    run=sum(r for _,_,r,_,_,_ in ts)/1000
    gc=sum(g for _,_,_,g,_,_ in ts)/1000
    sw=sum(w for *_, w,_ in ts)/1e6
    br=sum(b for *_, b in ts)/1e6
    print(f"{s:>5} {len(ts):>4} {start:>6.0f} {span:>7.1f} {wall:>7.1f} {run:>7.1f} {gc:>5.1f} {sw:>7.0f} {br:>7.0f}  {stage_names.get(s,'?')[:55]}")
