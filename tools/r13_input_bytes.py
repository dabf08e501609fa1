"""Sum input/shuffle bytes + records across one TIMED_RUN execution of a
registry query (event-log accounting). The r13 adjudicator for "does this
change add or remove a corpus pass" — e.g. it proved the keyless-percentile
range exchange is already stage-reused (shuffle written once, read twice)
and that a localCheckpoint there ADDED a pass. Usage:
  python tools/r13_input_bytes.py <query_name>"""
import glob, json, os, sys, time
REPO = "/root/repo"
sys.path.insert(0, REPO)
name = sys.argv[1]
sf = "/root/testdata/sf0.1"
evdir = "/tmp/spark-events-plain2"
os.makedirs(evdir, exist_ok=True)
import shutil
for f in glob.glob(evdir + "/*"):
    shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
from blazingsql_spark.queries.registry import all_queries
from blazingsql_spark.session import get_spark
spark = get_spark(app_name="inbytes", extra_conf={
    "spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir,
    "spark.eventLog.compress": "false"})
specs = all_queries()
specs[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
spark.sparkContext.setJobDescription("TIMED_RUN")
specs[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
spark.sparkContext.setJobDescription(None)
appid = spark.sparkContext.applicationId
spark.stop()
paths = []
for d in glob.glob(f"{evdir}/*{appid}*"):
    paths.extend([d] if os.path.isfile(d) else glob.glob(d + "/*"))
timed_stages = set()
inb = rec = srb = swb = 0
events = []
for p in paths:
    if "appstatus" in p: continue
    for line in open(p):
        try: e = json.loads(line)
        except Exception: continue
        events.append(e)
for e in events:
    if e.get("Event") == "SparkListenerJobStart":
        if (e.get("Properties") or {}).get("spark.job.description") == "TIMED_RUN":
            timed_stages.update(e["Stage IDs"])
for e in events:
    if e.get("Event") == "SparkListenerTaskEnd" and e.get("Stage ID") in timed_stages:
        m = e.get("Task Metrics") or {}
        im = m.get("Input Metrics") or {}
        inb += im.get("Bytes Read", 0); rec += im.get("Records Read", 0)
        srm = m.get("Shuffle Read Metrics") or {}
        srb += srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
        swm = m.get("Shuffle Write Metrics") or {}
        swb += swm.get("Shuffle Bytes Written", 0)
print(f"{name}: input_bytes={inb} input_records={rec} shuffle_read={srb} shuffle_write={swb} stages={len(timed_stages)}")
